package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureOps

/** Boundary pins for the preceding-window feature aggregate: the window is
  * [ts − 1h, ts) — closed at the hour edge, open at the entity row —
  * feature rows only, same user only. */
class FtWindowAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros
  private val T = 1000000000000L

  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))

  test("window is [ts-1h, ts): edge included, entity instant excluded") {
    val frame = ev(Seq(
      (1L, T, 1L, "purchase", 9.0),
      (2L, T - H, 1L, "view", 1.0),      // exactly 1h before: IN
      (3L, T - H - 1L, 1L, "view", 2.0), // 1h + 1us before: OUT
      (4L, T - 1L, 1L, "click", 3.0),    // 1us before: IN
      (5L, T, 1L, "view", 4.0),          // same instant: OUT (strictly before)
      (6L, T - 5L, 1L, "purchase", 5.0), // purchase: never a feature
      (7L, T - 5L, 2L, "view", 6.0),     // other user: OUT
      (8L, T, 3L, "purchase", 7.0)))     // no preceding activity at all
    val out = FeatureOps.ftWindowAggOf(frame).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      // purchase 1 at T: events 2 (hour edge, IN) + 4 (1us before, IN);
      // 3 is 1us past the edge, 5 shares the instant, 6 is a purchase,
      // 7 is another user
      (1L, 1L, 2L, 40000L),
      // purchase 6 at T-5: its OWN window shifts — events 2 and 3 are in
      // [T-5-1h, T-6], event 4 (T-1) is not yet
      (1L, 6L, 2L, 30000L),
      // purchase 8: no preceding activity — coalesced zeros, row kept
      (3L, 8L, 0L, 0L)), s"got ${out.toList}")
  }
}
