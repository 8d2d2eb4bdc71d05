package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.PointInTimeJoin

/** asofBucketed must be result-identical to asof on arbitrary data,
  * including ties, empty buckets and TTLs — checked on a seeded random
  * event stream. */
class AsofBucketedSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private lazy val featData = (1 to 2000).map { i =>
    (rnd.nextInt(7).toLong, new Timestamp(base + rnd.nextInt(30 * 86400) * 1000L),
      rnd.nextInt(100).toDouble)
  }.toDF("user_id", "ts", "value")

  private lazy val entData = (1 to 500).map { i =>
    (rnd.nextInt(10).toLong, new Timestamp(base + rnd.nextInt(30 * 86400) * 1000L), i.toLong)
  }.toDF("user_id", "entity_ts", "row_id")

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getAs[Long]("row_id") ->
        (Option(r.getAs[Timestamp]("feat_ts")), Option(r.getAs[java.lang.Double]("feat_value")))
    }.toMap

  test("bucketed asof equals plain asof (no TTL, 1-day buckets)") {
    val plain = collectMap(PointInTimeJoin.asof(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value")))
    val bucketed = collectMap(PointInTimeJoin.asofBucketed(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value"), bucketSec = 86400))
    assert(plain.size == 500 && plain == bucketed)
  }

  test("bucketed asof equals plain asof with TTL and coarse buckets") {
    val ttl = Some(3L * 86400)
    val plain = collectMap(PointInTimeJoin.asof(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value"), ttl))
    val bucketed = collectMap(PointInTimeJoin.asofBucketed(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value"),
      bucketSec = 7L * 86400, maxAgeSec = ttl))
    assert(plain == bucketed)
  }

  test("bucketed asof equals plain asof with tiny buckets (many empty)") {
    val plain = collectMap(PointInTimeJoin.asof(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value")))
    val bucketed = collectMap(PointInTimeJoin.asofBucketed(
      entData, featData, Seq("user_id"), "entity_ts", "ts", Seq("value"), bucketSec = 3600))
    assert(plain == bucketed)
  }
}
