package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Round-11 operator specs. */
class Round11OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("text_ngram_topk two-phase top-k equals the single-window global answer") {
    // A corpus engineered so bucketing matters: one language with >10
    // distinct bigrams spread across hash buckets, counts with exact ties
    // (rank must break lexicographically), plus a short-doc language and a
    // doc with <2 tokens (contributes nothing).
    val en = (0 until 40).flatMap { i =>
      val reps = 1 + (i % 7) // ties within each count class
      Seq.fill(reps)(s"w${i} w${(i + 1) % 40}")
    }.zipWithIndex.map { case (bg, j) => (100L + j, "en", bg) }
    val docs = (en ++ Seq(
      (1L, "de", "x y x y z"),
      (2L, "de", "y z"),
      (3L, "fr", "solo"))).toDF("doc_id", "lang", "text")

    val twoPhase = TextAnalysis.textNgramTopkOf(docs).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))

    // Independent single-window reference (the pre-r11 formulation).
    val ws = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val bigrams = zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val valid = when(size(ws) >= 2, slice(bigrams, lit(1), size(ws) - 1))
      .otherwise(array().cast("array<string>"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram"))
    val reference = docs
      .select(col("lang"), explode(valid).as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("bigram"), col("cnt"))
      .orderBy(col("lang"), col("rank"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))

    assert(twoPhase == reference)
    assert(twoPhase.count(_._1 == "en") == 10)
    assert(twoPhase.count(_._1 == "fr") == 0) // <2 tokens yields no bigram
  }

  test("sampleForTraining thins in the cap < n < 2·cap band (ceiling modulus)") {
    import graft.operators.Similarity
    val emb = spark.range(1500).select(col("id").as("vec_id"))
    // floor modulus was max(1500/1000, 1) = 1 → kept ALL 1500 rows; the
    // ceiling modulus 2 must thin to an expected 750
    val s = Similarity.sampleForTraining(emb, 1500, cap = 1000).count()
    assert(s < 1000, s"expected ~750 sampled rows under cap 1000, got $s")
    assert(s > 500, s"sample implausibly small: $s")
    // at/below the cap the corpus passes through untouched (gate stability)
    assert(Similarity.sampleForTraining(emb, 1500, cap = 1500).count() == 1500)
  }

  test("pq_encode matches the historical relational argmin bit for bit (incl ties)") {
    import graft.operators.Similarity
    val dim = 64
    val nSub = 4
    val subDim = dim / nSub
    val rnd = new scala.util.Random(71)
    // codebook with a PLANTED exact tie in subspace 0 (codes 1 and 2
    // identical): the argmin must keep the LOWEST code id, the historical
    // window (d asc, c asc) rule
    val cents: Seq[(Int, Int, Seq[Double])] = (for {
      s <- 0 until nSub; c <- 0 until 6
    } yield {
      val base = if (s == 0 && c == 2) Seq.tabulate(subDim)(j => (1 + j % 3) * 0.1)
      else Seq.fill(subDim)(rnd.nextDouble() * 2 - 1)
      (s, c, base)
    }).toSeq
    val tied = cents.map { case (s, c, v) =>
      if (s == 0 && c == 1) (s, c, cents.find(t => t._1 == 0 && t._2 == 2).get._3)
      else (s, c, v)
    }
    val ivfCents = Seq(Seq.tabulate(dim)(i => if (i == 0) 1.0 else 0.0),
      Seq.tabulate(dim)(i => if (i == 0) -1.0 else 0.0))
    val rot = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val model = Similarity.PqModel(ivfCents, rot, tied, nSub)
    val emb = (0 until 50).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.encodePq(emb, model)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("cell"), (0 until nSub).map(s => r.getAs[Int](s"c$s"))))
      .toMap
    // reference: the pre-r11 crossJoin + rank-window argmin, evaluated on
    // the SAME residual pipeline (l2norm + nearest-cell + rotation,
    // reproduced with identical Catalyst expressions)
    val spark2 = spark
    import org.apache.spark.sql.expressions.Window
    val vnD = transform(col("embedding"), x => x.cast("double"))
    val vnN = sqrt(aggregate(transform(vnD, x => x * x), lit(0.0), (acc, x) => acc + x))
    val vn = transform(vnD, x => x / greatest(vnN, lit(1e-12)))
    val cellsDf = broadcast(spark2.createDataFrame(
      ivfCents.zipWithIndex.map { case (v, i) => (i, v) }).toDF("cell", "ccvec"))
    val resid = emb.select(col("vec_id"),
        Similarity.nearestCellExpr(col("embedding"), ivfCents).as("cell"),
        vn.as("vn"))
      .join(cellsDf, Seq("cell"))
      .select(col("vec_id"), col("cell"),
        call_function("mat_vec", typedlit(rot.map(_.toSeq).toSeq),
          zip_with(col("vn"), col("ccvec"), (x, y) => x - y)).as("rv"))
    val centsB = broadcast(spark2.createDataFrame(tied).toDF("s", "c", "cvec"))
    val w = Window.partitionBy(col("vec_id"), col("s")).orderBy(col("d").asc, col("c"))
    val ref = resid.crossJoin(centsB)
      .withColumn("d", aggregate(
        zip_with(slice(col("rv"), col("s") * subDim + 1, lit(subDim)), col("cvec"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("vec_id"), col("cell"))
      .agg(max(when(col("s") === 0, col("c"))).as("c0"),
        (1 until nSub).map(s => max(when(col("s") === s, col("c"))).as(s"c$s")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("cell"), (0 until nSub).map(s => r.getAs[Int](s"c$s"))))
      .toMap
    assert(got.keySet == ref.keySet)
    // normalization: l2norm differs from the raw reference residual here
    // only through the SAME vn both paths share — compare codes per cell
    got.foreach { case (id, (cell, codes)) =>
      assert(codes == ref(id)._2, s"vec $id codes $codes vs ref ${ref(id)._2}")
      assert(cell == ref(id)._1, s"vec $id cell $cell vs ref ${ref(id)._1}")
    }
    // the planted tie resolves to the LOWEST code id: no vector may ever
    // encode subspace 0 as code 2 (code 1 is identical and lower)
    assert(got.values.forall(_._2.head != 2), "tie must break to the lowest code id")
  }

  test("32-subspace PQ geometry (the >400k band) encodes/round-trips correctly") {
    import graft.operators.Similarity
    // the 32x2d rung only engages past 400k vectors, so no gate corpus
    // exercises it — pin its arithmetic on a hand model: subDim=2 slices
    // must tile the vector exactly and the encode argmin must match a
    // plain Scala recompute of the same residual pipeline
    val dim = 64
    val nSub = 32
    val subDim = dim / nSub
    val rnd = new scala.util.Random(73)
    val cents: Seq[(Int, Int, Seq[Double])] = for {
      s <- 0 until nSub; c <- 0 until 16
    } yield (s, c, Seq.fill(subDim)(rnd.nextDouble() * 2 - 1))
    val ivfCents = Seq(Seq.tabulate(dim)(i => if (i == 0) 1.0 else 0.0),
      Seq.tabulate(dim)(i => if (i == 0) -1.0 else 0.0))
    val rot = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val model = Similarity.PqModel(ivfCents, rot, cents, nSub)
    assert(model.subDim == 2)
    val vecs = (0 until 30).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Similarity.encodePq(emb, model).collect()
      .map(r => r.getLong(0) -> (0 until nSub).map(s => r.getAs[Int](s"c$s"))).toMap
    val cb = (0 until nSub).map(s =>
      (0 until 16).map(c => cents.find(t => t._1 == s && t._2 == c).get._3))
    vecs.foreach { case (id, v) =>
      val d = v.map(_.toDouble)
      val norm = math.sqrt(d.map(x => x * x).sum) max 1e-12
      val vn = d.map(_ / norm)
      val cell = if (vn.zip(ivfCents(0)).map { case (a, b) => a * b }.sum >=
        vn.zip(ivfCents(1)).map { case (a, b) => a * b }.sum) 0 else 1
      val rv = vn.zip(ivfCents(cell)).map { case (a, b) => a - b }
      val expect = (0 until nSub).map { s =>
        val slice = rv.slice(s * subDim, (s + 1) * subDim)
        (0 until 16).minBy(c =>
          (slice.zip(cb(s)(c)).map { case (x, y) => (x - y) * (x - y) }.sum, c))
      }
      assert(got(id) == expect, s"vec $id: ${got(id)} vs $expect")
    }
  }

  test("knn_hamming_rerank plan: broadcast stages only, no cartesian blowup past packing") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import graft.operators.Similarity
    import graft.sources.Tables
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.knnHammingRerankOf(Tables.embeddings(spark, sfDir), 50)
        .queryExecution.executedPlan
      // the only all-pairs op allowed is the stage-1 packed-code crossJoin
      // against the BROADCAST 10-query frame (8 bytes/candidate); the float
      // rerank must reach vectors through equi-joins only
      val loops = plan.collect {
        case j: CartesianProductExec => j
        case j: BroadcastNestedLoopJoinExec => j
      }
      assert(loops.size == 1,
        s"expected exactly the packed-code broadcast stage, got ${loops.map(_.nodeName)}")
      assert(loops.head.isInstanceOf[BroadcastNestedLoopJoinExec],
        "the shortlist stage must broadcast the query side, never a shuffled cartesian")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("knn_hamming_rerank: full-depth shortlist degenerates to exact brute force") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count().toInt
    // shortlist = corpus: every candidate reaches the float rerank, so the
    // two-stage result must equal knn_brute row for row (the PQ degeneracy
    // contract applied to the binary rung)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val full = rows(Similarity.knnHammingRerankOf(emb, n))
    val brute = rows(Similarity.knnBrute(spark, sfDir))
    assert(full.nonEmpty && full == brute,
      s"degenerate rerank diverged: ${full.diff(brute).take(3)}")
    // and a SHALLOW shortlist still returns K rows per query (the rerank
    // can only reorder the shortlist, never empty it below K)
    val shallow = Similarity.knnHammingRerankOf(emb, 10)
      .groupBy(col("query_id")).count().collect()
    assert(shallow.forall(_.getLong(1) == 5L))
  }

  test("trainingCapFor keeps a ≥64 points-per-centroid floor through the cell clamp") {
    import graft.operators.Similarity
    // below the 64·k crossover the flat cap rules (gate corpora live here —
    // byte-stable artifacts); the crossover sits at k = 65536/64 = 1024
    assert(Similarity.trainingCapFor(16) == 65536L)
    assert(Similarity.trainingCapFor(1024) == 65536L)
    // past it the cap must grow as 64·k, or Lloyd degenerates toward one
    // point per centroid — pinned up to and INCLUDING the 65536-cell clamp
    for (k <- Seq(1096, 4096, 16384, 65536)) {
      val cap = Similarity.trainingCapFor(k)
      assert(cap == 64L * k, s"cap at k=$k must be 64·k, got $cap")
      assert(cap / k >= 64L, s"points-per-centroid floor broken at k=$k")
    }
    // and the cap stays a CONSTANT-bounded sample, never corpus-sized:
    // 64·65536 ≈ 4.2M rows at the clamp
    assert(Similarity.trainingCapFor(65536) == 4194304L)
  }

  test("CUPED centered production body matches the e6-integer gate on both gate corpora") {
    import graft.sources.Tables
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val ev = Tables.events(spark, dir)
      val gate = graft.operators.Growth.eventsCupedOf(ev).head()
      val prod = graft.operators.Growth.eventsCupedCenteredOf(ev).head()
      // identical arm frame
      assert(prod.getAs[Long]("n_a") == gate.getAs[Long]("n_a"))
      assert(prod.getAs[Long]("n_b") == gate.getAs[Long]("n_b"))
      assert(prod.getAs[Long]("conv_a") == gate.getAs[Long]("conv_a"))
      assert(prod.getAs[Long]("conv_b") == gate.getAs[Long]("conv_b"))
      // θ: the gate's e6 integer truncates toward zero, so the exact θ
      // (which the centered double form carries to ~1e-12 relative) sits
      // within 1e-6 of it by construction; tiny slack for double rounding
      val thetaGate = gate.getAs[Long]("theta_e6").toDouble / 1e6
      val theta = prod.getAs[Double]("theta")
      assert(math.abs(theta - thetaGate) <= 1e-6 + 1e-9,
        s"$dir: centered theta $theta vs gate $thetaGate")
      // the adjusted lift agrees at the same scale (both forms subtract
      // θ·dx from the same exact lift; e6 truncation bounds each term)
      val cupedGate = gate.getAs[Long]("cuped_lift_e6").toDouble / 1e6
      val cuped = prod.getAs[Double]("cuped_lift")
      assert(math.abs(cuped - cupedGate) <= 3e-6,
        s"$dir: centered cuped_lift $cuped vs gate $cupedGate")
    }
  }
}
