package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, OracleVariants}

/** Semantics pins for corpus_fuzzy_decontaminate and its neutral-family
  * twin on a planted corpus: a verbatim benchmark extract in the corpus is
  * flagged with EVERY band hit (identical signature — the deterministic
  * case), the extract's source flags through 90% Jaccard, and unrelated
  * docs stay clean. Both hash families must agree on all three calls. */
class FuzzyDecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  // doc 0 (≡ 0 mod 97) is the benchmark source; doc 1 is the VERBATIM
  // extract (first ⌈90%⌉ of doc 0's tokens — the classic "eval item pasted
  // into a training page"); docs 2-4 are unrelated prose
  private lazy val plantedDir: String = {
    val words = (0 until 200).map(i => s"w${i * 31 % 199}")
    val src = words.mkString(" ")
    val extract = words.take((words.size * 9 + 9) / 10).mkString(" ")
    val others = (2 to 4).map(i =>
      (i.toLong, (0 until 150).map(j => s"z${i}x${j * 17 % 151}").mkString(" ")))
    val docs = (Seq((0L, src), (1L, extract)) ++ others)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-decon").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("verbatim extract flagged on every band; source flagged; unrelated docs clean") {
    for ((name, out) <- Seq(
      "production" -> Dedup.corpusFuzzyDecontaminate(spark, plantedDir),
      "twin"       -> OracleVariants.corpusFuzzyDecontaminateOracle(spark, plantedDir))) {
      val byDoc = out.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bands_hit"), r.getAs[Long]("n_bench_docs"))).toMap
      val allBands = if (name == "production") 16L else 4L
      assert(byDoc.get(1L).map(_._1).contains(allBands),
        s"$name: the verbatim extract must hit all $allBands bands, got ${byDoc.get(1L)}")
      assert(byDoc.contains(0L),
        s"$name: the 90%-Jaccard source doc must be flagged, got ${byDoc.keySet}")
      assert((byDoc.keySet & Set(2L, 3L, 4L)).isEmpty,
        s"$name: unrelated docs flagged: ${byDoc.keySet & Set(2L, 3L, 4L)}")
      byDoc.values.foreach { case (bands, docs) =>
        assert(bands >= 1 && bands <= allBands && docs >= 1)
      }
    }
  }

  test("one corpus exchange: signature aggregate partitioning reused by the rollup") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Dedup.corpusFuzzyDecontaminate(spark, sfDir).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the benchmark side enters as a broadcast; the CORPUS-SIZED side
    // shuffles exactly once (the doc_id min-hash aggregate). The
    // two-distinct rollup above the join plans its own Expand exchanges,
    // but those carry only band-HIT rows — contamination-sized, not
    // corpus-sized — so they are not pinned here.
    val join = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(join.size == 1, s"expected one broadcast band join, got ${join.size}")
    def hashEx(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.filter(_.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx(join.head.children.head).size == 1,
      s"the corpus side must shuffle once, got ${hashEx(join.head.children.head).size}")
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.isEmpty, "the benchmark band join must broadcast, never SMJ")
  }
}
