package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Round-13 operator specs: the radius-truncated user-domain harmonic
  * centrality (verdict item 4). */
class Round13OpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Path 1-2-3-4-5-6 plus a disconnected pair 7-8 — hand-checkable BFS
    * distances exercising truncation, symmetry and disconnection. */
  private def pathPairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L))
    .toDF("a", "b")

  test("harmonicTruncated: exact R-ball harmonic on a hand-built path graph") {
    val got = GraphOps.harmonicTruncated(pathPairs, radius = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // src 1: d(2..5)=1..4, node 6 at d=5 is OUTSIDE the ball
    assert(got(1L) == (4L, 1000000L + 500000L + 333333L + 250000L))
    // src 2: d(1)=d(3)=1, d(4)=2, d(5)=3, d(6)=4
    assert(got(2L) == (5L, 2000000L + 500000L + 333333L + 250000L))
    // src 3: whole path within 3 hops
    assert(got(3L) == (5L, 2000000L + 1000000L + 333333L))
    // symmetry of the path: 4≅3, 5≅2, 6≅1
    assert(got(4L) == got(3L) && got(5L) == got(2L) && got(6L) == got(1L))
    // the disconnected pair contributes only each other
    assert(got(7L) == (1L, 1000000L) && got(8L) == (1L, 1000000L))
    // only nodes with edges appear (callers left-join the rest to 0/0)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("harmonicTruncated: the radius is the contract, not a convergence knob") {
    val r2 = GraphOps.harmonicTruncated(pathPairs, radius = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r2(1L) == (2L, 1500000L), s"radius-2 ball of an endpoint: ${r2(1L)}")
    assert(r2(3L) == (4L, 3000000L), s"radius-2 ball of the center: ${r2(3L)}")
    // a radius PAST the diameter equals the diameter's answer (early exit
    // on an empty frontier is unobservable — the truncation contract's
    // equal-by-construction argument)
    val r5 = GraphOps.harmonicTruncated(pathPairs, radius = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val r9 = GraphOps.harmonicTruncated(pathPairs, radius = 9).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r5 == r9, "rounds past the diameter must be the identity")
    assert(r5(1L)._1 == 5L, "radius 5 reaches the far endpoint")
  }

  test("graph_harmonic_users: gate shape — every user emits one row, edge-less users 0/0") {
    val dir = "/root/testdata/sf0.001"
    val out = GraphOps.graphHarmonicUsers(spark, dir).collect()
    val users = graft.sources.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.length == users, s"one row per user: ${out.length} vs $users")
    out.foreach { r =>
      val (nr, h) = (r.getAs[Long]("n_reach"), r.getAs[Long]("harmonic_e6"))
      assert(nr >= 0 && h >= 0)
      assert((nr == 0) == (h == 0), s"reach and score are zero together: $r")
      // every within-ball term is in (0, 1e6]: 1e6·n_reach bounds the score
      assert(h <= nr * 1000000L, s"term bound violated: $r")
    }
    assert(out.exists(_.getAs[Long]("n_reach") > 0), "sanity: someone co-acts")
  }
}
