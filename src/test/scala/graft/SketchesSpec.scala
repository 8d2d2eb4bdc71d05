package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** HLL distinct sketches: merge associativity (the artifact property),
  * estimator accuracy across cardinality regimes, and the gate summary's
  * consumer-side correction. */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def randomDocs(nDocs: Int, vocab: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val words = (0 until 30).map(_ => s"w${rnd.nextInt(vocab)}")
      (i.toLong, s"s${i % 7}", "en", words.mkString(" "))
    }.toDF("doc_id", "source", "lang", "text")
  }

  /** The consumer-side corrected estimate the scaladoc promises:
    * linear counting below the small-range threshold, raw HLL above. */
  private def corrected(vZero: Long, sScaled: Long): Double = {
    val m = Sketches.M.toDouble
    val raw = 0.709 * m * m * (1L << Sketches.RMax) / (1000.0 * sScaled) * 1000.0
    if (raw <= 2.5 * m && vZero > 0) m * math.log(m / vZero.toDouble) else raw
  }

  test("per-source sketches max-merge to exactly the direct sketch") {
    val docs = randomDocs(200, 3000, seed = 11)
    val toks = docs.select(col("lang"), col("source"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
    val direct = Sketches.registersOf(toks, Seq("lang"), col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.registersOf(toks, Seq("lang", "source"), col("w"))
      .groupBy(col("lang"), col("bucket")).agg(max(col("m_reg")).as("m_reg"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(direct.nonEmpty && merged == direct,
      "element-wise max of per-source registers must equal the direct sketch")
  }

  test("corrected estimate stays within 30% across cardinality regimes") {
    for ((vocab, seed) <- Seq((60, 1), (800, 2), (6000, 3))) {
      val docs = randomDocs(300, vocab, seed)
      val out = Sketches.corpusDistinctSketchOf(docs).collect().head
      val exact = out.getAs[Long]("n_exact").toDouble
      val est = corrected(out.getAs[Long]("v_zero"), out.getAs[Long]("s_scaled"))
      val err = math.abs(est - exact) / exact
      assert(err <= 0.30, f"vocab=$vocab exact=$exact est=$est%.1f err=$err%.3f")
    }
  }

  test("wau sketch: window-merged registers equal sketching the window directly") {
    // the decomposition claim itself: for a chosen day, the trailing-7-day
    // estimate from merged PER-DAY registers must equal the estimate from
    // sketching that window's events in one pass — exact register algebra,
    // not an accuracy bound
    val rnd = new scala.util.Random(5)
    val baseMs = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val ev = (0 until 4000).map { _ =>
      (rnd.nextInt(900).toLong,
        new java.sql.Timestamp(baseMs + rnd.nextInt(20 * 86400) * 1000L))
    }.toDF("user_id", "ts")
    val out = Sketches.eventsWauSketchOf(ev).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("v_zero"), r.getAs[Long]("s_scaled"), r.getAs[Long]("exact_wau"))))
      .toMap
    val d1 = out.keys.max
    // direct one-window sketch: restrict events to [d1-6, d1] and treat the
    // whole slice as one "day" — same registers the merge must produce
    val windowEv = ev.filter(
      floor(unix_micros(col("ts")) / lit(86400000000L)).between(d1 - 6, d1))
    val direct = Sketches.eventsWauSketchOf(
        windowEv.withColumn("ts", lit(new java.sql.Timestamp(baseMs))))
      .collect().head
    assert((direct.getAs[Long]("v_zero"), direct.getAs[Long]("s_scaled")) ==
      ((out(d1)._1, out(d1)._2)),
      "merged per-day registers must equal the direct window sketch")
    // accuracy across the curve: raw estimate within 35% of exact WAU
    out.foreach { case (d, (vz, ss, exact)) =>
      if (exact >= 50) {
        val est = corrected(vz, ss)
        assert(math.abs(est - exact) / exact.toDouble <= 0.35,
          s"day $d exact=$exact est=$est")
      }
    }
  }

  test("source overlap: inclusion-exclusion tracks planted overlaps, disjoint clamps low") {
    val rnd = new scala.util.Random(17)
    // inclusion-exclusion compounds THREE ±13% (m=64) estimators, so its
    // absolute noise is ~1/4 of the cardinality scale — the op resolves
    // DOMINANT overlaps (near-dup mirrors, syndication), not slivers.
    // Fixture: A = [0, 2000), B = [200, 2200) (90% shared), C disjoint.
    def docsFor(src: String, lo: Int, hi: Int) = (0 until 100).map { i =>
      val ws = (0 until 50).map(_ => s"t${lo + rnd.nextInt(hi - lo)}")
      (src.hashCode.toLong * 1000 + i, src, "en", ws.mkString(" "))
    }
    val docs = (docsFor("a", 0, 2000) ++ docsFor("b", 200, 2200) ++
      docsFor("c", 5000, 7000)).toDF("doc_id", "source", "lang", "text")
    val out = Sketches.corpusSourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("est_overlap"), r.getAs[Long]("exact_overlap")))).toMap
    val (estAb, exactAb) = out(("a", "b"))
    assert(exactAb > 1200, s"fixture must plant a dominant overlap, got $exactAb")
    assert(estAb >= exactAb / 3 && estAb <= exactAb * 3,
      s"a~b overlap estimate $estAb vs exact $exactAb out of band")
    val (estAc, exactAc) = out(("a", "c"))
    assert(exactAc == 0)
    assert(estAc <= estAb / 2,
      s"disjoint pair must read clearly lower: $estAc vs overlapping $estAb")
  }

  test("gate summary on the test corpus corrects to near the exact count") {
    val out = Sketches.corpusDistinctSketch(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = corrected(r.getAs[Long]("v_zero"), r.getAs[Long]("s_scaled"))
      assert(math.abs(est - exact) / exact <= 0.30,
        s"${r.getAs[String]("lang")}: exact=$exact corrected=$est")
    }
  }

  // --- quantile sketch -------------------------------------------------

  private def randomPrices(n: Int, seed: Int, maxCents: Long = 12000000L) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // log-uniform across magnitudes, down to single-digit cents — the
      // small-value octaves (msb < 4) must round-trip too
      val v = math.max(1L, (math.exp(rnd.nextDouble() * math.log(maxCents.toDouble))).toLong)
      (i.toLong, Seq("A", "N", "R")(rnd.nextInt(3)), v / 100.0)
    }.toDF("l_orderkey", "l_returnflag", "l_extendedprice")
  }

  test("quantile sketch: split-corpus registers SUM-merge to the direct histogram") {
    val li = randomPrices(3000, seed = 21)
    val direct = Sketches.priceRegisters(li).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val parts = Seq(li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 =!= 0))
    val merged = parts.map(Sketches.priceRegisters(_).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap)
      .reduce { (a, b) =>
        (a.keySet ++ b.keySet).map(k =>
          k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      }
    assert(direct.nonEmpty && merged == direct,
      "element-wise sum of split-corpus registers must equal the direct histogram")
  }

  test("quantile sketch: estimate is a lower bound within 625 bp of the exact quantile") {
    for (seed <- Seq(31, 32, 33)) {
      val out = Sketches.qQuantileSketchOf(randomPrices(2500, seed)).collect()
      assert(out.length == 9, s"3 flags x 3 quantiles, got ${out.length}")
      out.foreach { r =>
        val (est, exact, err) = (r.getAs[Long]("est"), r.getAs[Long]("exact"),
          r.getAs[Long]("err_bp"))
        assert(est <= exact, s"estimate must lower-bound: $est > $exact")
        assert(err >= 0 && err <= 625,
          s"flag=${r.getString(0)} q=${r.getLong(1)}: err_bp=$err (est=$est exact=$exact)")
      }
    }
  }

  test("quantile sketch: single-value and tiny-cent corpora land on exact buckets") {
    // every price identical: all three quantiles hit that value's bucket
    val uni = (0 until 200).map(i => (i.toLong, "A", 7.77)).toDF(
      "l_orderkey", "l_returnflag", "l_extendedprice")
    Sketches.qQuantileSketchOf(uni).collect().foreach { r =>
      assert(r.getAs[Long]("exact") == 777L)
      assert(r.getAs[Long]("err_bp") <= 625)
    }
    // sub-16-cent values: the msb<4 octaves are EXACT (bucket width 1)
    val tiny = (0 until 90).map(i => (i.toLong, "A", (1 + i % 9) / 100.0)).toDF(
      "l_orderkey", "l_returnflag", "l_extendedprice")
    Sketches.qQuantileSketchOf(tiny).collect().foreach { r =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("exact"),
        s"sub-16-cent buckets are width 1: ${r.mkString(",")}")
    }
  }
}
