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

  test("lsh_sign_bucket: fused loop equals the per-plane column arithmetic and guards its edges") {
    // independently recompute the LCG plane family driver-side (the
    // Round12 intPlaneRef formula) and compare against the native expr
    def planeRef(p: Int): IndexedSeq[Long] =
      (0 until 64).map { d =>
        val x = (p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
        (x % 2001L) - 1000L
      }
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(2001).toLong - 1000L)))
    def bucketRef(v: Seq[Long], off: Int, n: Int): Long =
      (0 until n).map { p =>
        val qp = planeRef(off + p)
        if ((0 until 64).map(d => v(d) * qp(d)).sum > 0) 1L << p else 0L
      }.sum
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        call_function("lsh_sign_bucket", col("v"), lit(6), lit(6)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == bucketRef(v, 6, 6), s"vec $id")
    }
    // NULL vector -> NULL; a NULL ELEMENT or a SHORT vector zeroes the
    // WHOLE bucket — the SQL twin's plane dots are 64-term chains, so one
    // NULL term (null element / out-of-range embedding[d]) nulls every
    // dot and every CASE branch goes untaken; per-dim null-skipping would
    // leave a live partial dot and diverge cross-engine (r13 review)
    assert(spark.sql(
      "SELECT lsh_sign_bucket(CAST(NULL AS ARRAY<BIGINT>), 0, 4)")
      .collect().head.isNullAt(0))
    val nullElem = spark.sql(
      "SELECT lsh_sign_bucket(array_insert(CAST(ARRAY() AS ARRAY<BIGINT>), 1, CAST(NULL AS BIGINT)), 0, 4) AS b")
      .collect().head.getLong(0)
    assert(nullElem == 0L, s"null element must zero the bucket, got $nullElem")
    // a 64-dim vector KNOWN to bucket non-zero goes to 0 when any single
    // element nulls, and when truncated to 63 dims
    val hot = vecs.find { case (_, v) => bucketRef(v, 6, 6) != 0L }.get._2
    val hotOpt: Seq[Option[Long]] = hot.map(Option(_))
    val hotDf = Seq(
        (1L, hotOpt),
        (2L, hotOpt.updated(3, None: Option[Long])),
        (3L, hotOpt.take(63)))
      .toDF("id", "v")
      .select(col("id"),
        call_function("lsh_sign_bucket", col("v"), lit(6), lit(6)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hotDf(1L) == bucketRef(hot, 6, 6) && hotDf(1L) != 0L)
    assert(hotDf(2L) == 0L, s"one null element must zero the bucket: ${hotDf(2L)}")
    assert(hotDf(3L) == 0L, s"a 63-dim vector must bucket 0: ${hotDf(3L)}")
    // analysis-time guards: non-foldable / null / oversized plane counts
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lsh_sign_bucket(ARRAY(CAST(1 AS BIGINT)), 0, 64)").collect()
    }
    assert(err.getMessage.contains("at most 63"), err.getMessage)
    val errNull = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT lsh_sign_bucket(ARRAY(CAST(1 AS BIGINT)), CAST(NULL AS INT), 4)").collect()
    }
    assert(errNull.getMessage.contains("must not be NULL"), errNull.getMessage)
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
