package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** corpus_mix_a{3,5,7} weights are round(pow(n,α)·1000); pow (unlike sqrt)
  * is not guaranteed correctly-rounded identically across engines, so the
  * cross-engine hash gate is only deterministic while no gate-corpus cell
  * count lands within an ulp of a .5 rounding boundary. This spec pins a
  * ≥1e-6 margin for EVERY (lang, source) cell of the gate corpora — ~7
  * orders of magnitude wider than a 1-ulp disagreement on values ~1e4 —
  * turning would-be data luck into a checked property. */
class TemperedMixSpec extends SparkSpecBase {
  import spark.implicits._

  test("pow-weight rounding margins hold for every gate-corpus cell count") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val counts = Tables.documents(spark, dir)
        .groupBy(col("lang"), col("source")).count()
        .collect().map(_.getLong(2))
      assert(counts.nonEmpty)
      for (n <- counts; a <- Seq(0.3, 0.5, 0.7)) {
        val x = math.pow(n.toDouble, a) * 1000.0
        val frac = x - math.floor(x)
        assert(math.abs(frac - 0.5) > 1e-6,
          s"pow($n, $a)*1000 = $x is within 1e-6 of a rounding boundary ($dir)")
      }
    }
  }

  test("lower α flattens the mix: small cells gain relative share") {
    // one dominant source (900 docs) vs one small (100): as α drops the
    // small cell's share of the sampled output must grow monotonically
    val docs = spark.range(0, 1000).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      when(col("id") < 900, "web").otherwise("books").as("source"),
      lit("text body").as("text"))
    def shareSmall(alphaTenths: Int): Double = {
      val out = TextAnalysis.corpusMixTempered(docs, alphaTenths, Seq("source"))
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_sampled")).toMap
      out("books").toDouble / math.max(out.values.sum, 1L).toDouble
    }
    val (s3, s5, s7) = (shareSmall(3), shareSmall(5), shareSmall(7))
    assert(s3 > s5 && s5 > s7, s"shares not monotone: a3=$s3 a5=$s5 a7=$s7")
    // raw share of the small source is 0.1; every α < 1 upweights it
    assert(s7 > 0.1)
    // and the output still lands near the half-corpus target
    val total = TextAnalysis.corpusMixTempered(docs, 5, Seq("source"))
      .agg(sum(col("n_sampled"))).head().getLong(0)
    assert(math.abs(total - 500L) < 100L, s"sampled $total of 1000 (target 500)")
  }

  test("joint (lang × source) mixing treats each cell independently") {
    val out = TextAnalysis.corpusMixTempered(
      Tables.documents(spark, "/root/testdata/sf0.01"), 5)
    val rows = out.collect()
    // one output row per (lang, source) cell; sampled never exceeds available
    assert(rows.length ==
      Tables.documents(spark, "/root/testdata/sf0.01")
        .select("lang", "source").distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
  }
}
