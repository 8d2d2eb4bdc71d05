package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side dense engine for the FIXED entity-domain graph family
  * (the ≤25-node nation trade graph).
  *
  * Why this exists (optimization r14, guide §1.2/§2.4): the nation-domain
  * analytics iterate over a ≤625-row edge matrix, but the DataFrame forms
  * in [[GraphOps]] paid 6–24 driver-synchronized Spark rounds (each a
  * localCheckpoint materialization + shuffle) to move ≤25-row vectors —
  * measured 0.8–1.7 s per query at sf0.1 where the arithmetic itself is
  * microseconds. This is exactly the repo's "markov class" rule (CLAUDE.md:
  * driver-side loops over collected BOUNDED matrices use int-indexed
  * primitive arrays): the 100 TB-scale work — collapsing the fact tables to
  * the entity-domain edge list — stays distributed (the persisted
  * [[GraphOps]] tradeGraph artifact); only the entity-domain iteration
  * moves to the driver. The domain bound is a CONTRACT (nation is a fixed
  * ≤25-row dimension, docs/driver_action_audit.md), so the collect is
  * O(625) rows forever, independent of corpus size.
  *
  * Every function replays the EXACT integer arithmetic of its DataFrame
  * twin in [[GraphOps]] (same truncating divisions, same scale-reduction
  * discipline, same tie rules) — all sums are over nonnegative longs within
  * the documented overflow bounds, order-independent, so the results are
  * bit-identical. GraphDenseSpec cross-proves dense == DataFrame-form on
  * randomized graphs, and the DuckDB oracle gates pin the end results.
  *
  * The growing user-domain family (graph_*_users, graph_components) never
  * routes here — its vertex set scales with the corpus and stays on the
  * distributed frontier loops.
  */
private[graft] object GraphDense {

  final case class Edge(src: String, dst: String, w: Long)

  /** Collect the entity-domain graph: ONE tiny job over the persisted
    * ≤|D|² edge artifact (|D| = fixed dimension domain size). */
  def collect(nodes0: DataFrame, edges0: DataFrame): (Array[String], Array[Edge]) = {
    val names = nodes0.collect().map(_.getString(0)).sorted
    val es = edges0.collect().map(r => Edge(r.getString(0), r.getString(1), r.getLong(2)))
    (names, es)
  }

  /** Mean-thresholded unique undirected pair list — the `und`/`kept`
    * collapse shared by triangles/bfs/harmonic/kcore in [[GraphOps]]:
    * a<b canonical pairs of summed weight, kept iff uw >= tot DIV n_pairs. */
  def keptPairs(es: Array[Edge]): Array[(String, String)] = {
    val und = new scala.collection.mutable.HashMap[(String, String), Long]
    es.foreach { e =>
      if (e.src != e.dst) {
        val k = if (e.src < e.dst) (e.src, e.dst) else (e.dst, e.src)
        und(k) = und.getOrElse(k, 0L) + e.w
      }
    }
    if (und.isEmpty) return Array.empty
    val nPairs = und.size.toLong
    val tot = und.valuesIterator.sum
    val thr = tot / nPairs
    und.iterator.filter(_._2 >= thr).map(_._1).toArray.sorted
  }

  private def adjacency(kept: Array[(String, String)]): Map[String, Array[String]] =
    (kept.map { case (a, b) => (a, b) } ++ kept.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2) }

  /** BFS hop distances from `src` over the bidirectional kept pairs;
    * absent keys are unreachable. */
  private def bfsFrom(src: String, adj: Map[String, Array[String]]): scala.collection.mutable.HashMap[String, Long] = {
    val dist = new scala.collection.mutable.HashMap[String, Long]
    dist(src) = 0L
    var frontier = List(src)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = scala.collection.mutable.ListBuffer[String]()
      frontier.foreach { n =>
        adj.getOrElse(n, Array.empty).foreach { m =>
          if (!dist.contains(m)) { dist(m) = d; next += m }
        }
      }
      frontier = next.toList
    }
    dist
  }

  /** [[GraphOps.graphPagerankOf]] arithmetic, dense. */
  def pagerank(spark: SparkSession, names: Array[String], es: Array[Edge]): DataFrame = {
    import spark.implicits._
    val outW = es.groupBy(_.src).map { case (s, g) => s -> g.map(_.w).sum }
    // share_e9 = (w DIV s) * 1e9 DIV (w_out DIV s), s = max(1, w_out DIV 1e8)
    val shares = es.map { e =>
      val wOut = outW(e.src)
      val s = math.max(1L, wOut / 100000000L)
      (e.src, e.dst, (e.w / s) * 1000000000L / (wOut / s))
    }
    val rank = new scala.collection.mutable.HashMap[String, Long]
    names.foreach(n => rank(n) = 1000000L)
    for (_ <- 1 to GraphOps.PageRankIters) {
      val inMass = new scala.collection.mutable.HashMap[String, Long]
      // inner-join semantics of the DataFrame form: an edge whose src is
      // outside the node domain contributes nothing
      shares.foreach { case (src, dst, sh) =>
        rank.get(src).foreach { r =>
          inMass(dst) = inMass.getOrElse(dst, 0L) + r * sh / 1000000000L
        }
      }
      names.foreach(n => rank(n) = 150000L + 85L * inMass.getOrElse(n, 0L) / 100L)
    }
    names.toSeq.map(n => (n, rank(n))).toDF("nation", "rank_e6")
  }

  /** [[GraphOps.graphHitsOf]] arithmetic, dense. */
  def hits(spark: SparkSession, names: Array[String], es: Array[Edge]): DataFrame = {
    import spark.implicits._
    val auth = new scala.collection.mutable.HashMap[String, Long]
    val hub = new scala.collection.mutable.HashMap[String, Long]
    names.foreach { n => auth(n) = 1000000L; hub(n) = 1000000L }
    if (es.nonEmpty) {
      val wmax = es.map(_.w).max
      val s = math.max(1L, wmax / 1000000000L)
      val wn = es.map(e => (e.src, e.dst, (e.w / s) * 1000000L / (wmax / s)))
      def halfStep(in: scala.collection.mutable.HashMap[String, Long],
                   out: scala.collection.mutable.HashMap[String, Long],
                   keyOf: ((String, String, Long)) => String,
                   otherOf: ((String, String, Long)) => String): Unit = {
        val raw = new scala.collection.mutable.HashMap[String, Long]
        // inner-join semantics: edges whose score-side endpoint is outside
        // the node domain contribute nothing
        wn.foreach { t =>
          in.get(otherOf(t)).foreach { v =>
            raw(keyOf(t)) = raw.getOrElse(keyOf(t), 0L) + v * t._3 / 1000000L
          }
        }
        val m = if (raw.isEmpty) 0L else raw.valuesIterator.max
        names.foreach { n =>
          out(n) = if (m > 0) raw.getOrElse(n, 0L) * 1000000L / m else 0L
        }
      }
      for (_ <- 1 to GraphOps.HitsIters) {
        halfStep(auth, hub, _._1, _._2)  // hubRaw[src] += auth[dst]·wn
        halfStep(hub, auth, _._2, _._1)  // authRaw[dst] += hub[src]·wn
      }
    }
    names.toSeq.map(n => (n, hub(n), auth(n))).toDF("nation", "hub_e6", "auth_e6")
  }

  /** [[GraphOps.triangleCensusOf]] arithmetic over the kept pairs, dense. */
  def triangles(spark: SparkSession, names: Array[String],
                kept: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val deg = new scala.collection.mutable.HashMap[String, Long]
    kept.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1L
      deg(b) = deg.getOrElse(b, 0L) + 1L
    }
    // rank-orient: lo = smaller (deg, name) endpoint, tie (equal deg) -> a
    val o = kept.map { case (a, b) =>
      val (da, db) = (deg(a), deg(b))
      if (da < db || da == db) (a, b, math.max(da, db)) else (b, a, math.max(da, db))
    }
    val oSet = o.map(t => (t._1, t._2)).toSet
    val nTri = new scala.collection.mutable.HashMap[String, Long]
    o.groupBy(_._1).foreach { case (_, g) =>
      var i = 0
      while (i < g.length) {
        var j = 0
        while (j < g.length) {
          val (lo, y, ydeg) = g(i); val (_, z, zdeg) = g(j)
          if ((ydeg < zdeg || (ydeg == zdeg && y < z)) && oSet((y, z))) {
            nTri(lo) = nTri.getOrElse(lo, 0L) + 1L
            nTri(y) = nTri.getOrElse(y, 0L) + 1L
            nTri(z) = nTri.getOrElse(z, 0L) + 1L
          }
          j += 1
        }
        i += 1
      }
    }
    names.toSeq.map { n =>
      val d = deg.getOrElse(n, 0L)
      val t = nTri.getOrElse(n, 0L)
      val poss = d * (d - 1L) / 2L
      (n, d, t, poss, t * 10000L / math.max(poss, 1L))
    }.toDF("nation", "degree", "n_tri", "tri_possible", "clust_bp")
  }

  /** [[GraphOps.graphReciprocityOf]] arithmetic, dense. */
  def reciprocity(spark: SparkSession, names: Array[String], es: Array[Edge]): DataFrame = {
    import spark.implicits._
    val e = es.iterator.filter(x => x.src != x.dst).map(x => (x.src, x.dst)).toSet
    val outDeg = e.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    val inDeg = e.groupBy(_._2).map { case (n, g) => n -> g.size.toLong }
    val recip = e.iterator.filter { case (s, d) => e((d, s)) }.toSeq
      .groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    names.toSeq.map { n =>
      val od = outDeg.getOrElse(n, 0L)
      (n, od, inDeg.getOrElse(n, 0L), recip.getOrElse(n, 0L),
        recip.getOrElse(n, 0L) * 10000L / math.max(od, 1L))
    }.toDF("nation", "out_deg", "in_deg", "n_recip", "recip_bp")
  }

  /** [[GraphOps.graphBfsOf]] arithmetic, dense: source = min kept `a`. */
  def bfs(spark: SparkSession, names: Array[String],
          kept: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    if (kept.isEmpty)
      return names.toSeq.map(n => (n, -1L)).toDF("nation", "dist")
    val src = kept.map(_._1).min
    val dist = bfsFrom(src, adjacency(kept))
    names.toSeq.map(n => (n, dist.getOrElse(n, -1L))).toDF("nation", "dist")
  }

  /** [[GraphOps.graphHarmonicOf]] arithmetic, dense: multi-source BFS from
    * every domain node; H(v) = Σ_{0<d} 1e6 DIV d, n_reach beside it. */
  def harmonic(spark: SparkSession, names: Array[String],
               kept: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val adj = adjacency(kept)
    names.toSeq.map { n =>
      val dist = bfsFrom(n, adj)
      val reached = dist.iterator.filter(_._2 > 0L).toSeq
      (n, reached.size.toLong, reached.map(1000000L / _._2).sum)
    }.toDF("nation", "n_reach", "harmonic_e6")
  }

  /** [[GraphOps.graphKcoreOf]] arithmetic, dense: iterative peel with the
    * identical convergence rule (stable when survivor count repeats or 0). */
  def kcore(spark: SparkSession, names: Array[String],
            kept: Array[(String, String)], k: Int): DataFrame = {
    import spark.implicits._
    val bi = kept ++ kept.map { case (a, b) => (b, a) }
    var surv: Set[String] = bi.map(_._1).toSet
    var n = surv.size.toLong
    var stable = n == 0L
    while (!stable) {
      val deg = bi.iterator.filter { case (a, b) => surv(a) && surv(b) }
        .toSeq.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
      val next = deg.iterator.filter(_._2 >= k).map(_._1).toSet
      val m = next.size.toLong
      stable = m == n || m == 0L
      n = m
      surv = next
    }
    val coreDeg = bi.iterator.filter { case (a, b) => surv(a) && surv(b) }
      .toSeq.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
    names.toSeq.map { n =>
      coreDeg.get(n) match {
        case Some(d) => (n, 1L, d)
        case None    => (n, 0L, 0L)
      }
    }.toDF("nation", "in_kcore", "core_deg")
  }
}
