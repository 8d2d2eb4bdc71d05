package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ties corpus_bloom_decontaminate to its exact oracle-gated sibling: the
  * Bloom form may over-flag (bounded, measured) but must NEVER miss a doc
  * the exact inverted-index join flags — the no-false-negative guarantee
  * is what makes the KB-artifact form usable as the 100 TB fast path. */
class BloomDecontaminateSpec extends SparkSpecBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("flagged set is a superset of the exact join's, per-doc counts dominate") {
    for (dir <- dirs) {
      val exact = Dedup.corpusDecontaminate(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
      val bloom = Dedup.corpusBloomDecontaminate(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged_shingles")).toMap
      assert(exact.nonEmpty, s"exact decontamination found nothing in $dir — vacuous")
      val missed = exact.keySet -- bloom.keySet
      assert(missed.isEmpty, s"Bloom missed contaminated docs $missed in $dir")
      exact.foreach { case (d, n) =>
        assert(bloom(d) >= n, s"doc $d: bloom flagged ${bloom(d)} < exact $n in $dir")
      }
      // false-positive budget: docs flagged by Bloom but clean per the
      // exact join, as a fraction of the corpus side
      val nCorpus = graft.sources.Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(97)) =!= 0).count()
      val fp = (bloom.keySet -- exact.keySet).size.toDouble / nCorpus
      assert(fp <= 0.05, s"doc-level FPR $fp exceeds 5% in $dir")
    }
  }

  test("the corpus probe is a pure projection: no join, no benchmark shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Dedup.corpusBloomDecontaminate(spark, sfDir).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "Bloom membership must not plan a join")
    val hashEx = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.filter(_.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx.size == 1, s"only the doc_id aggregate may shuffle, got ${hashEx.size}")
  }
}
