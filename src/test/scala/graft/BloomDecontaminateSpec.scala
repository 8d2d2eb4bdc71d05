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

  test("audit gate pins the oracle's literals when invariants hold — and detects violations") {
    // passing direction at BOTH gate SFs (table sizes are non-linear
    // across SFs): the gate's computed row must equal what the DuckDB
    // oracle pins — (exact count, 0 missed, 0 undercounted, FPR ok)
    for (dir <- dirs) {
      val exactCount = Dedup.corpusDecontaminate(spark, dir).count()
      val row = Dedup.corpusBloomDecontaminateAudit(spark, dir).collect()
      assert(row.length == 1)
      val r = row.head
      assert(exactCount > 0, s"vacuous audit in $dir")
      assert(r.getAs[Long]("n_exact_docs") == exactCount, s"$dir: ${r.mkString(",")}")
      assert(r.getAs[Long]("n_missed") == 0L, s"$dir: ${r.mkString(",")}")
      assert(r.getAs[Long]("n_undercount") == 0L, s"$dir: ${r.mkString(",")}")
      assert(r.getAs[Boolean]("fp_within_bound"), s"$dir: ${r.mkString(",")}")
    }
    // failing direction on synthetic inputs (deterministic regardless of
    // gate-corpus contamination counts): a missed doc, an undercounted
    // doc, and an over-budget FP surplus must each surface — proving the
    // audit would hash-mismatch, not silently pass
    import spark.implicits._
    val exact = Seq((1L, 5L), (2L, 3L)).toDF("doc_id", "n_hits")
    val bloom = Seq((2L, 2L), (3L, 7L)).toDF("doc_id", "n_flagged_shingles")
    val bad = Dedup.bloomAuditOf(exact, bloom, 1000L).head()
    assert(bad.getAs[Long]("n_exact_docs") == 2L, s"doctored: ${bad.mkString(",")}")
    assert(bad.getAs[Long]("n_missed") == 1L, s"doctored: ${bad.mkString(",")}")
    assert(bad.getAs[Long]("n_undercount") == 1L, s"doctored: ${bad.mkString(",")}")
    assert(bad.getAs[Boolean]("fp_within_bound"), "1 FP doc of 1000 is in budget")
    val tight = Dedup.bloomAuditOf(exact, bloom, 10L).head()
    assert(!tight.getAs[Boolean]("fp_within_bound"),
      "1 FP doc of 10 (10% > 5%) must trip the budget")
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
