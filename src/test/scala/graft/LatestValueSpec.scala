package graft

import java.sql.Timestamp

import graft.operators.LatestValue

class LatestValueSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rows = Seq(
    (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
    (1L, ts("2024-01-05 00:00:00"), 2L, 11.0),
    (1L, ts("2024-01-05 00:00:00"), 3L, 12.0), // same ts, later sequence
    (2L, ts("2024-01-02 00:00:00"), 4L, 20.0)
  ).toDF("user_id", "ts", "seq", "value")

  test("latest picks greatest (ts, seq) per key") {
    val out = LatestValue.latest(rows, Seq("user_id"), Seq("ts", "seq"), Seq("ts", "seq", "value"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(out == Map(1L -> 12.0, 2L -> 20.0))
  }

  test("dedup keeps one row per (key, ts) with greatest tiebreak") {
    val out = LatestValue.dedup(rows, Seq("user_id"), "ts", Seq("seq"), Seq("seq", "value"))
    assert(out.count() == 3)
    val v = out.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts")) -> r.getAs[Double]("value")).toMap
    assert(v((1L, ts("2024-01-05 00:00:00"))) == 12.0)
  }
}
