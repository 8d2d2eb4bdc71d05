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
