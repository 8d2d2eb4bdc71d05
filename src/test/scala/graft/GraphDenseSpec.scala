package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GraphDense, GraphOps}

/** The r14 optimization moved the FIXED nation-domain graph analytics onto
  * the driver-side dense engine (GraphDense — the markov-class rule for
  * bounded collected matrices). These specs prove the dense engine replays
  * the distributed DataFrame forms bit-for-bit: same randomized weighted
  * graphs through both, exact row equality. The DataFrame forms stay the
  * production shape for growing domains and the spec oracle here. */
class GraphDenseSpec extends SparkSpecBase {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def assertSame(dense: DataFrame, distributed: DataFrame): Unit = {
    assert(dense.columns.toSeq == distributed.columns.toSeq)
    assert(sortedRows(dense) == sortedRows(distributed))
  }

  /** Random directed weighted graph over a small string domain — includes
    * self-loops, isolated nodes, skewed weights (to exercise the
    * scale-reduction divisions), and an out-of-domain endpoint (to pin the
    * inner-join semantics of the rank/score joins). */
  private def randomGraph(seed: Int): (Seq[String], Seq[(String, String, Long)]) = {
    val rnd = new scala.util.Random(seed)
    val n = 4 + rnd.nextInt(10)
    val names = (0 until n).map(i => f"N$i%02d")
    val nEdges = 1 + rnd.nextInt(3 * n)
    val es = Seq.fill(nEdges) {
      val s = names(rnd.nextInt(n))
      val d = if (rnd.nextInt(12) == 0) "ZZ_OUTSIDE" else names(rnd.nextInt(n))
      // weights spanning the scale-reduction threshold (w_out DIV 1e8 > 1)
      val w = if (rnd.nextBoolean()) 1L + rnd.nextInt(1000).toLong
              else 1L + rnd.nextLong().abs % 90000000000L
      (s, d, w)
    }
    (names, es)
  }

  test("dense nation-graph engine equals the DataFrame forms on randomized graphs") {
    for (seed <- 1 to 10) {
      val (names, esSeq) = randomGraph(seed)
      val nodes = names.toDF("node")
      val edges = esSeq.toDF("src", "dst", "w")
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      val (dn, de) = GraphDense.collect(nodes, edges)
      val kept = GraphDense.keptPairs(de)

      assertSame(GraphDense.pagerank(spark, dn, de),
        GraphOps.graphPagerankOf(nodes, edges))
      assertSame(GraphDense.hits(spark, dn, de),
        GraphOps.graphHitsOf(nodes, edges))
      assertSame(GraphDense.triangles(spark, dn, kept),
        GraphOps.graphTrianglesOf(nodes, edges))
      assertSame(GraphDense.reciprocity(spark, dn, de),
        GraphOps.graphReciprocityOf(nodes, edges))
      assertSame(GraphDense.bfs(spark, dn, kept),
        GraphOps.graphBfsOf(nodes, edges))
      assertSame(GraphDense.harmonic(spark, dn, kept),
        GraphOps.graphHarmonicOf(nodes, edges))
      assertSame(GraphDense.kcore(spark, dn, kept, GraphOps.KCoreK),
        GraphOps.graphKcoreOf(nodes, edges, GraphOps.KCoreK))
    }
  }

  test("dense engine on the gate corpus trade graph equals the DataFrame forms") {
    // the real artifact shape (25 nations, dense revenue weights): the
    // PASSING case on production data, per the repo's spec rule — the
    // shipped queries (dense-engined) must equal the distributed forms fed
    // the same persisted edge artifact
    val (nodes, edges) = GraphOps.tradeGraphForSpec(spark, sfDir)
    val q = GraphOps.queries
    assertSame(q("graph_pagerank")(spark, sfDir),
      GraphOps.graphPagerankOf(nodes, edges).orderBy(col("rank_e6").desc, col("nation")))
    assertSame(q("graph_hits")(spark, sfDir),
      GraphOps.graphHitsOf(nodes, edges)
        .orderBy(col("auth_e6").desc, col("hub_e6").desc, col("nation")))
    assertSame(q("graph_triangles")(spark, sfDir),
      GraphOps.graphTrianglesOf(nodes, edges).orderBy(col("nation")))
    assertSame(q("graph_reciprocity")(spark, sfDir),
      GraphOps.graphReciprocityOf(nodes, edges).orderBy(col("nation")))
    assertSame(q("graph_bfs")(spark, sfDir),
      GraphOps.graphBfsOf(nodes, edges).orderBy(col("nation")))
    assertSame(q("graph_harmonic")(spark, sfDir),
      GraphOps.graphHarmonicOf(nodes, edges).orderBy(col("nation")))
    assertSame(q("graph_kcore")(spark, sfDir),
      GraphOps.graphKcoreOf(nodes, edges, GraphOps.KCoreK).orderBy(col("nation")))
  }
}
