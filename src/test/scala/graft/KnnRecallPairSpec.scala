package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** r15: knn_recall's shared-scan ivfpq pair (one codes-scan + ADC pass
  * serving both nprobe floor rows) must be EXACTLY the production
  * per-nprobe pipeline at every setting — the gate's recall rows may not
  * move by a single pair. Deterministic (hash seeding + Lloyd + fixed
  * geometry), so set equality is the right assertion. */
class KnnRecallPairSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("shared-scan ivfpq pair slices equal the production knnIvfPqWith per nprobe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pair_spec").toString
    spark.conf.set("graft.pq.dir", tmp)
    try {
      val rr = Similarity.pqRerankFor(Similarity.corpusCount(spark, dir))
      val pair = Similarity.knnIvfPqPairRecall(spark, dir, Seq(2, 4), rr)
      for (np <- Seq(2, 4)) {
        val got = pairsOf(pair.filter(col("np") === np))
        val want = pairsOf(Similarity.knnIvfPqWith(spark, dir, nprobe = np, rerank = rr))
        assert(got == want,
          s"np=$np slice diverges from production: extra=${got.diff(want)} missing=${want.diff(got)}")
        assert(got.nonEmpty, s"np=$np slice is empty — the gate would lose its floor rows")
      }
    } finally spark.conf.unset("graft.pq.dir")
  }
}
