package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.PointInTimeJoin

class PointInTimeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def entity = Seq(
    (1L, ts("2024-01-10 00:00:00"), 100L),
    (1L, ts("2024-01-20 00:00:00"), 101L),
    (2L, ts("2024-01-15 00:00:00"), 102L),
    (3L, ts("2024-01-15 00:00:00"), 103L) // key with no features
  ).toDF("user_id", "entity_ts", "row_id")

  private def features = Seq(
    (1L, ts("2024-01-09 00:00:00"), 10.0),
    (1L, ts("2024-01-10 00:00:00"), 11.0), // exact-ts match for row 100
    (1L, ts("2024-01-12 00:00:00"), 12.0),
    (2L, ts("2024-01-01 00:00:00"), 20.0)
  ).toDF("user_id", "ts", "value")

  test("asof attaches latest feature at-or-before entity ts") {
    val out = PointInTimeJoin.asof(entity, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value")).collect()
      .map(r => r.getAs[Long]("row_id") -> Option(r.getAs[java.lang.Double]("feat_value"))).toMap
    assert(out(100L).contains(11.0)) // <= is inclusive
    assert(out(101L).contains(12.0)) // latest wins
    assert(out(102L).contains(20.0))
    assert(out(103L).isEmpty)        // no features for key 3
  }

  test("asof with maxAge nulls out stale features") {
    val out = PointInTimeJoin.asof(entity, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value"), maxAgeSec = Some(3L * 86400)).collect()
      .map(r => r.getAs[Long]("row_id") -> Option(r.getAs[java.lang.Double]("feat_value"))).toMap
    assert(out(100L).contains(11.0))  // same-instant feature is fresh
    assert(out(102L).isEmpty)         // 14 days old > 3-day TTL
    val ft = PointInTimeJoin.asof(entity, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value"), maxAgeSec = Some(3L * 86400))
      .filter(col("row_id") === 102L).select("feat_ts").collect()
    assert(ft.head.isNullAt(0))       // matched ts also nulled when stale
  }

  test("asof preserves every entity row and column") {
    val out = PointInTimeJoin.asof(entity, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value"))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("user_id", "entity_ts", "row_id", "feat_ts", "feat_value"))
  }

  test("asof dedups multiple feature rows at the same (key, ts)") {
    val dupFeats = features.union(Seq((1L, ts("2024-01-10 00:00:00"), 5.0))
      .toDF("user_id", "ts", "value"))
    val out = PointInTimeJoin.asof(entity, dupFeats, Seq("user_id"),
      "entity_ts", "ts", Seq("value")).collect()
      .map(r => r.getAs[Long]("row_id") -> r.getAs[Double]("feat_value")).toMap
    assert(out(100L) == 11.0) // greatest value wins deterministically
  }

  test("asofForward attaches the earliest feature at-or-after entity ts") {
    val out = PointInTimeJoin.asofForward(entity, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value")).collect()
      .map(r => r.getAs[Long]("row_id") -> Option(r.getAs[java.lang.Double]("feat_value"))).toMap
    assert(out(100L).contains(11.0)) // >= is inclusive: exact-ts visible
    assert(out(101L).isEmpty)        // nothing after 01-20
    assert(out(102L).isEmpty)        // user 2's only feature is in the past
    assert(out(103L).isEmpty)
    // maxAge bounds the FORWARD distance: 01-12 is 2 days after 01-10
    val ttl = PointInTimeJoin.asofForward(
      entity.filter(col("row_id") === 100L),
      features.filter(col("ts") =!= ts("2024-01-10 00:00:00")),
      Seq("user_id"), "entity_ts", "ts", Seq("value"),
      maxAgeSec = Some(86400L)).collect()
    assert(ttl.head.isNullAt(ttl.head.fieldIndex("feat_value")))
  }

  test("asofNearest picks the closer side, ties prefer backward") {
    val ent = Seq(
      (1L, ts("2024-01-11 00:00:00"), 200L), // back 01-10 (1d) vs fwd 01-12 (1d): tie -> back
      (1L, ts("2024-01-11 18:00:00"), 201L), // fwd 01-12 (6h) closer than back 01-10
      (2L, ts("2024-01-15 00:00:00"), 202L), // only a past feature -> backward
      (3L, ts("2024-01-15 00:00:00"), 203L)  // no features at all
    ).toDF("user_id", "entity_ts", "row_id")
    val out = PointInTimeJoin.asofNearest(ent, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value")).collect()
      .map(r => r.getAs[Long]("row_id") -> Option(r.getAs[java.lang.Double]("feat_value"))).toMap
    assert(out(200L).contains(11.0)) // tie -> backward (01-10 value)
    assert(out(201L).contains(12.0)) // forward closer
    assert(out(202L).contains(20.0)) // degrades to plain asof
    assert(out(203L).isEmpty)
    // column contract identical to asof
    val cols = PointInTimeJoin.asofNearest(ent, features, Seq("user_id"),
      "entity_ts", "ts", Seq("value")).columns.toSeq
    assert(cols == Seq("user_id", "entity_ts", "row_id", "feat_ts", "feat_value"))
  }
}
