package graft

import org.apache.spark.sql.functions._

/** Round-12 contracts: the truncated k-core peel (graph_kcore_users), the
  * registry change history, and the three new oracle twins' replayable
  * arithmetic (integer LSH family, seed-argmax cluster assignment). */
class Round12OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------------------------------------------------------- k-core

  /** Reference implementation of the truncated simultaneous peel. */
  private def peelRef(pairs: Seq[(Long, Long)], k: Int,
                      maxRounds: Int): Map[Long, Int] = {
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var surv = adj.keySet
    var round = 0
    var stable = surv.isEmpty
    while (!stable && round < maxRounds) {
      val next = surv.filter(u => (adj(u) & surv).size >= k)
      stable = next == surv || next.isEmpty
      surv = next
      round += 1
    }
    surv.map(u => u -> (adj(u) & surv).size).toMap
  }

  private def peelOf(pairs: Seq[(Long, Long)], k: Int,
                     maxRounds: Int): Map[Long, Int] =
    graft.operators.GraphOps.kcoreTruncatedPeel(
        pairs.toDF("a", "b"), k, maxRounds)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("core_deg").toInt).toMap

  test("kcoreTruncatedPeel: clique survives, tail peels, core degrees exact") {
    // 5-clique (nodes 0..4) + a path tail 4-10-11-12: at k=3 only the
    // clique survives; every clique node keeps in-core degree 4
    val clique = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val tail = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val got = peelOf(clique ++ tail, k = 3, maxRounds = 16)
    assert(got == (0L until 5L).map(_ -> 4).toMap, s"got $got")
  }

  test("kcoreTruncatedPeel: truncation IS the contract past the round bound") {
    // a 40-node path at k=2 peels two endpoints per round: the true
    // 2-core is empty but needs 20 rounds — at maxRounds=16 both the
    // operator and the reference must stop at the SAME intermediate
    // subgraph (rounds 17+ are what the unrolled-CTE oracle would also
    // not run). Early-exit must remain unobservable: a converged graph
    // (the clique above) returns the same answer at any larger bound.
    val path = (0L until 39L).map(i => (i, i + 1))
    val ref = peelRef(path, k = 2, maxRounds = 16)
    assert(ref.nonEmpty, "sanity: 16 rounds must NOT reach the empty fixpoint")
    assert(peelOf(path, k = 2, maxRounds = 16) == ref)
    val clique = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    assert(peelOf(clique, k = 3, maxRounds = 16) ==
      peelOf(clique, k = 3, maxRounds = 64))
  }

  test("graph_kcore_users equals a driver-side peel over the persisted edge artifact") {
    val dir = "/root/testdata/sf0.001"
    val edges = graft.operators.GraphOps.coActivityEdges(spark, dir)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq
    val ref = peelRef(edges, graft.operators.GraphOps.KCoreUsersK,
      graft.operators.GraphOps.KCoreUsersRounds)
    val got = graft.operators.GraphOps.graphKcoreUsers(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("in_kcore"), r.getAs[Long]("core_deg")))
    got.foreach { case (u, in, cd) =>
      assert(in == (if (ref.contains(u)) 1L else 0L), s"user $u in_kcore")
      assert(cd == ref.getOrElse(u, 0).toLong, s"user $u core_deg")
    }
    // every distinct events user gets a row, core members included
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("graph_triangles_users equals a driver-side census over the persisted edges") {
    val dir = "/root/testdata/sf0.001"
    val edges = graft.operators.GraphOps.coActivityEdges(spark, dir)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val adj = edges.toSeq.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val triOf = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count { case Seq(x, y) =>
        adj(x).contains(y)
      }.toLong
    }
    val got = graft.operators.GraphOps.graphTrianglesUsers(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_tri"), r.getAs[Long]("tri_possible"),
        r.getAs[Long]("clust_bp")))
    got.foreach { case (u, d, t, p, c) =>
      val wd = adj.get(u).map(_.size.toLong).getOrElse(0L)
      val wt = triOf.getOrElse(u, 0L)
      assert(d == wd, s"user $u degree")
      assert(t == wt, s"user $u n_tri")
      assert(p == wd * (wd - 1) / 2, s"user $u tri_possible")
      assert(c == wt * 10000L / math.max(wd * (wd - 1) / 2, 1L), s"user $u clust_bp")
    }
    assert(got.exists(_._3 > 0), "sanity: the gate corpus has triangles")
  }

  // ------------------------------------------------------ registry history

  test("registry_history: attributed change log covers every object family") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.FeatureOps.registryHistory(spark, dir)
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("author"),
        r.getAs[String]("family"), r.getAs[String]("object_name"),
        r.getAs[String]("member"), r.getAs[String]("status")))
    val want = Seq(
      (2L, "bob", "ENTITY", "c_custkey", "value_type", "CHANGED"),
      (2L, "bob", "FEATURE", "customer_profile", "c_acctbal", "TYPE_CHANGED"),
      (2L, "bob", "FEATURE", "user_activity", "event_type", "REMOVED"),
      (2L, "bob", "FEATURE", "user_activity", "session_len", "ADDED"),
      (2L, "bob", "FEATURE", "user_activity", "value", "MAX_AGE_CHANGED"),
      (3L, "carol", "FEATURE", "customer_profile", "c_acctbal", "REMOVED"),
      (3L, "carol", "FEATURE", "customer_profile", "c_mktsegment", "REMOVED"),
      (3L, "carol", "FEATURE", "user_activity", "value", "TYPE_CHANGED"),
      (3L, "carol", "ODFV", "activity_derived", "value_x2", "CHANGED"),
      (3L, "carol", "STORE", "online_main", "config", "CHANGED"))
    assert(got.toSeq == want, s"got ${got.toSeq}")
    // the entity retype and ODFV/store edits carry their defs verbatim
    val byKey = graft.operators.FeatureOps.registryHistory(spark, dir)
      .collect().map(r => (r.getAs[String]("family"), r.getAs[String]("member"),
        r.getAs[Long]("version")) ->
        (r.getAs[String]("old_def"), r.getAs[String]("new_def"))).toMap
    assert(byKey(("ENTITY", "value_type", 2L)) == ("INT64", "STRING"))
    assert(byKey(("ODFV", "value_x2", 3L)) ==
      ("round(user_activity__value * 2, 4)", "round(user_activity__value * 3, 4)"))
    assert(byKey(("STORE", "config", 3L)) ==
      ("redis|cfg=host=localhost:6379|subs=default:*:false",
       "redis|cfg=host=localhost:6379|subs=default:user_activity:false"))
  }

  test("registry_history over persisted dumps equals in-memory diffs (lossless save/load)") {
    // every family rides Registry.save/load in demoHistoryReloaded; if the
    // persisted dumps lost an entity type, ODFV expression or store config
    // the persisted history would differ from the in-memory one
    val dir = "/root/testdata/sf0.001"
    val fo = graft.operators.FeatureOps
    val v1 = {
      val r = graft.model.Registry.demo(dir); r.applyStore(fo.demoStore); r
    }
    val inMem = Seq(
      (2L, "bob", v1, fo.demoEvolved(dir)),
      (3L, "carol", fo.demoEvolved(dir), fo.demoEvolvedV3(dir)))
      .map { case (v, a, prev, next) =>
        fo.registryHistoryDiffOf(
            fo.registryMembersDF(spark, prev), fo.registryMembersDF(spark, next))
          .filter(col("status") =!= "UNCHANGED")
          .select(lit(v).as("version"), lit(a).as("author"), col("*"))
      }.reduce(_ unionByName _)
      .orderBy(col("version"), col("family"), col("project"),
        col("object_name"), col("member"))
      .collect().toSeq
    val persisted = fo.registryHistory(spark, dir).collect().toSeq
    assert(persisted == inMem)
  }

  // ------------------------------------------------------------- LSH twins

  private def quantize(v: Seq[Float]): IndexedSeq[Long] =
    v.map(x => math.round(x.toDouble * 1000)).toIndexedSeq

  private def intPlaneRef(p: Int): IndexedSeq[Long] =
    (0 until 64).map { d =>
      val x = (p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
      (x % 2001L) - 1000L
    }

  private val Planes = graft.operators.OracleVariants.LshOraclePlanes

  private def bucketRef(qv: IndexedSeq[Long], planeOffset: Int): Long =
    (0 until Planes).map { p =>
      val qp = intPlaneRef(planeOffset + p)
      val dot = (0 until 64).map(d => qv(d) * qp(d)).sum
      if (dot > 0) 1L << p else 0L
    }.sum

  private def cosRef(a: IndexedSeq[Long], b: IndexedSeq[Long]): BigDecimal = {
    val dot = (0 until a.size).map(d => a(d) * b(d)).sum
    val den = math.sqrt(math.max(
      a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble, 1.0))
    BigDecimal(dot.toDouble / den).setScale(4, BigDecimal.RoundingMode.HALF_UP)
  }

  /** The integer planes are the exact ×1000 copy of the float LCG family —
    * the claim the twins' engine-neutrality rests on. */
  test("integer LSH planes are the exact x1000 copy of the float family") {
    for (p <- 0 until 3 * Planes; d <- 0 until 64) {
      val x = (p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
      val floatPlane = (x % 2001L).toDouble / 1000.0 - 1.0
      assert(intPlaneRef(p)(d) == math.round(floatPlane * 1000.0),
        s"plane $p dim $d")
    }
  }

  test("pack_signs equals the CaseWhen column form it replaced (nulls, short arrays)") {
    val rows = Seq(
      (1L, Seq.tabulate(64)(i => if (i % 3 == 0) -1.0f else 0.5f)),
      (2L, Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -2.0f)),
      (3L, Seq.fill(64)(0.0f)) // >= 0 everywhere: all bits set
    ).toDF("vec_id", "embedding")
    def caseForm(offset: Int) =
      (0 until 32).map { i =>
        when(element_at(col("embedding"), offset + i + 1) >= 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val got = rows.select(col("vec_id"),
      call_function("pack_signs", col("embedding"), lit(0)).as("lo"),
      call_function("pack_signs", col("embedding"), lit(32)).as("hi"),
      caseForm(0).as("elo"), caseForm(32).as("ehi")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("lo") == r.getAs[Long]("elo"), s"lo vec ${r.getLong(0)}")
      assert(r.getAs[Long]("hi") == r.getAs[Long]("ehi"), s"hi vec ${r.getLong(0)}")
    }
    // NULL vector -> NULL (the column form's element_at(null) path differs;
    // a null VECTOR never reaches packing in production — queries filter it)
    val nullRow = spark.sql(
      "SELECT pack_signs(CAST(NULL AS ARRAY<FLOAT>), 0) AS p").collect().head
    assert(nullRow.isNullAt(0))
    // SHORT array (ANSI element_at would throw; the native form reads it
    // as the column form would with null-safe access): missing elements
    // contribute 0 bits — vec of 40 elems, elems 20..39 are >= 0
    val short = Seq((4L, Seq.tabulate(40)(i => i.toFloat - 20f)))
      .toDF("vec_id", "embedding")
      .select(call_function("pack_signs", col("embedding"), lit(0)).as("lo"),
        call_function("pack_signs", col("embedding"), lit(32)).as("hi"))
      .collect().head
    assert(short.getAs[Long]("lo") == 0xFFF00000L, f"lo=${short.getLong(0)}%x")
    assert(short.getAs[Long]("hi") == 0xFFL, f"hi=${short.getLong(1)}%x")
    // a NULL literal offset is rejected at analysis (r13/ADVICE): eval
    // would unbox it to 0 while codegen never consults offGen.isNull —
    // the two paths must not be allowed to agree by accident
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT pack_signs(ARRAY(CAST(1.0 AS FLOAT)), CAST(NULL AS INT))")
        .collect()
    }
    assert(err.getMessage.contains("offset must not be NULL"), err.getMessage)
    // ...and the non-null literal path (the passing case) still analyzes
    assert(spark.sql("SELECT pack_signs(ARRAY(CAST(1.0 AS FLOAT)), 0) AS p")
      .collect().head.getLong(0) == 1L)
  }

  test("dedup_embed_lsh_oracle equals a full driver-side replay of the pipeline") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        quantize(r.getSeq[Float](1))).toIndexedSeq.sortBy(_._1)
    val buckets = (0 until 3).map(t =>
      emb.map { case (id, qv) => id -> bucketRef(qv, t * Planes) }.toMap)
    def near(t: Int, a: Long, b: Long): Boolean =
      java.lang.Long.bitCount(buckets(t)(a) ^ buckets(t)(b)) <= 1
    val byId = emb.toMap
    val want = (for {
      i <- emb.indices; j <- (i + 1) until emb.size
      a = emb(i)._1; b = emb(j)._1
      if (0 until 3).exists(t => near(t, a, b))
      c = cosRef(byId(a), byId(b)) if c > BigDecimal("0.35")
    } yield (a, b, c)).toSet
    val got = graft.operators.OracleVariants.dedupEmbedLshOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        BigDecimal(r.getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  test("knn_lsh_oracle ranks exactly the quantized top-5 of each query's probed buckets") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> quantize(r.getSeq[Float](1)))
      .toIndexedSeq.sortBy(_._1)
    val bucket = emb.map { case (id, qv) => id -> bucketRef(qv, 0) }.toMap
    val byId = emb.toMap
    val want = emb.filter(_._1 < 10).flatMap { case (q, qv) =>
      val probes = Set(bucket(q)) ++
        (0 until Planes).map(p => bucket(q) ^ (1L << p))
      emb.filter { case (c, _) => c != q && probes.contains(bucket(c)) }
        .map { case (c, cv) => (c, cosRef(qv, cv)) }
        .sortBy { case (c, cos) => (-cos, c) }.take(5)
        .zipWithIndex.map { case ((c, cos), i) => (q, (i + 1).toLong, c, cos) }
    }.toSet
    val got = graft.operators.OracleVariants.knnLshOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"),
        BigDecimal(r.getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  test("knn_ivf_oracle: candidates come ONLY from the 4 probed cells; ranks replay") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> quantize(r.getSeq[Float](1)))
      .toIndexedSeq.sortBy(_._1)
    val frag = graft.operators.TextAnalysis.idHashSql("x")
    val nums = "\\d+".r.findAllIn(frag).map(_.toLong).toSeq
    def idHash(id: Long): Long = (nums(0) * (id % nums(1)) + nums(2)) % nums(1)
    val seeds = emb.map(_._1).sortBy(id => (idHash(id), id)).take(16)
    val byId = emb.toMap
    def cosD(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
      val dot = a.indices.map(d => a(d) * b(d)).sum
      dot.toDouble / math.sqrt(math.max(
        a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble, 1.0))
    }
    val cellOf = emb.map { case (id, qv) =>
      id -> seeds.map(s => (s, cosD(qv, byId(s))))
        .sortBy { case (s, c) => (-c, s) }.head._1
    }.toMap
    val want = emb.filter(_._1 < 10).flatMap { case (q, qv) =>
      val probed = seeds.map(s => (s, cosD(qv, byId(s))))
        .sortBy { case (s, c) => (-c, s) }.take(4).map(_._1).toSet
      emb.filter { case (c, _) => c != q && probed.contains(cellOf(c)) }
        .map { case (c, cv) => (c, cosRef(qv, cv)) }
        .sortBy { case (c, cos) => (-cos, c) }.take(5)
        .zipWithIndex.map { case ((c, cos), i) => (q, (i + 1).toLong, c, cos) }
    }.toSet
    val got = graft.operators.OracleVariants.knnIvfOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"),
        BigDecimal(r.getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  test("knn_pq_oracle: integer encode argmin and ADC additivity replay driver-side") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> quantize(r.getSeq[Float](1)))
      .toIndexedSeq.sortBy(_._1)
    val frag = graft.operators.TextAnalysis.idHashSql("x")
    val nums = "\\d+".r.findAllIn(frag).map(_.toLong).toSeq
    def idHash(id: Long): Long = (nums(0) * (id % nums(1)) + nums(2)) % nums(1)
    val seeds = emb.map(_._1).sortBy(id => (idHash(id), id)).take(4)
    val byId = emb.toMap
    def sub(v: IndexedSeq[Long], s: Int): IndexedSeq[Long] = v.slice(s * 16, s * 16 + 16)
    def sqd(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    def codeOf(v: IndexedSeq[Long], s: Int): Long =
      seeds.map(c => (c, sqd(sub(v, s), sub(byId(c), s))))
        .sortBy { case (c, d) => (d, c) }.head._1
    def adc(q: IndexedSeq[Long], v: IndexedSeq[Long]): Long =
      (0 until 4).map(s => sqd(sub(q, s), sub(byId(codeOf(v, s)), s))).sum
    // shortlist: top-62 by (adc, id), then rerank by quantized cosine
    val want = emb.filter(_._1 < 10).flatMap { case (q, qv) =>
      val shortlist = emb.filter(_._1 != q)
        .map { case (c, cv) => (c, adc(qv, cv)) }
        .sortBy { case (c, d) => (d, c) }.take(62).map(_._1)
      shortlist.map(c => (c, cosRef(qv, byId(c))))
        .sortBy { case (c, cos) => (-cos, c) }.take(5)
        .zipWithIndex.map { case ((c, cos), i) => (q, (i + 1).toLong, c, cos) }
    }.toSet
    val got = graft.operators.OracleVariants.knnPqOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"),
        BigDecimal(r.getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  // shared driver-side replay helpers for the seed-geometry twins
  private def loadEmb(dir: String): IndexedSeq[(Long, IndexedSeq[Long])] =
    graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> quantize(r.getSeq[Float](1)))
      .toIndexedSeq.sortBy(_._1)

  private def idHashRef(id: Long): Long = {
    val nums = "\\d+".r
      .findAllIn(graft.operators.TextAnalysis.idHashSql("x")).map(_.toLong).toSeq
    (nums(0) * (id % nums(1)) + nums(2)) % nums(1)
  }

  private def cosD(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
    val dot = a.indices.map(d => a(d) * b(d)).sum
    dot.toDouble / math.sqrt(math.max(
      a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble, 1.0))
  }

  test("knn_graph_oracle: every source's top-3 within its 2 probed cells replays") {
    val dir = "/root/testdata/sf0.001"
    val emb = loadEmb(dir)
    val seeds = emb.map(_._1).sortBy(id => (idHashRef(id), id)).take(16)
    val byId = emb.toMap
    def topSeeds(qv: IndexedSeq[Long], n: Int): Seq[Long] =
      seeds.map(s => (s, cosD(qv, byId(s))))
        .sortBy { case (s, c) => (-c, s) }.take(n).map(_._1)
    val cellOf = emb.map { case (id, qv) => id -> topSeeds(qv, 1).head }.toMap
    val want = emb.flatMap { case (src, sv) =>
      val probed = topSeeds(sv, 2).toSet
      emb.filter { case (d, _) => d != src && probed.contains(cellOf(d)) }
        .map { case (d, dv) => (d, cosRef(sv, dv)) }
        .sortBy { case (d, c) => (-c, d) }.take(3)
        .zipWithIndex.map { case ((d, c), i) =>
          (src, (i + 1).toLong, d,
            (c * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }
    }.toSet
    val got = graft.operators.OracleVariants.knnGraphOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("dst_id"), r.getAs[Long]("csim_e4"))).toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  test("embed_clusters_oracle equals a driver-side union-find over the twin edges") {
    // at BOTH gate SFs (the two-SF floor-pin discipline): the r14
    // truncation contract (min label within ClusterHops hops, unrolled in
    // both engines) must be semantically invisible at the gate corpora —
    // union-find is FULL connected components, so equality here proves
    // the hop budget covers every component's min-eccentricity
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val edges = graft.operators.OracleVariants.knnGraphOracle(spark, dir)
        .filter(col("csim_e4") >= 3500)
        .select(col("src_id"), col("dst_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val allIds = loadEmb(dir).map(_._1)
      val want = allIds.map(id =>
        (id, if (parent.contains(id)) find(id) else id)).map { case (id, c) =>
        (id, c, if (id == c) 1L else 0L)
      }.toSet
      val got = graft.operators.OracleVariants.embedClustersOracle(spark, dir)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[Long]("cluster_id"), r.getAs[Long]("keep"))).toSet
      assert(got == want,
        s"$dir: only-got ${(got -- want).take(5)} only-want ${(want -- got).take(5)}")
    }
  }

  test("knn_ivfpq_oracle: ADC scan restricted to probed cells, then rerank — replays") {
    val dir = "/root/testdata/sf0.001"
    val emb = loadEmb(dir)
    val byId = emb.toMap
    val seeds16 = emb.map(_._1).sortBy(id => (idHashRef(id), id)).take(16)
    val seeds4 = seeds16.take(4)
    def argmaxSeed(qv: IndexedSeq[Long], n: Int): Seq[Long] =
      seeds16.map(s => (s, cosD(qv, byId(s))))
        .sortBy { case (s, c) => (-c, s) }.take(n).map(_._1)
    val cellOf = emb.map { case (id, qv) => id -> argmaxSeed(qv, 1).head }.toMap
    def sub(v: IndexedSeq[Long], s: Int) = v.slice(s * 16, s * 16 + 16)
    def sqd(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    def codeOf(v: IndexedSeq[Long], s: Int): Long =
      seeds4.map(c => (c, sqd(sub(v, s), sub(byId(c), s))))
        .sortBy { case (c, d) => (d, c) }.head._1
    val want = emb.filter(_._1 < 10).flatMap { case (q, qv) =>
      val probed = argmaxSeed(qv, 4).toSet
      val shortlist = emb
        .filter { case (c, _) => c != q && probed.contains(cellOf(c)) }
        .map { case (c, cv) =>
          (c, (0 until 4).map(s => sqd(sub(qv, s), sub(byId(codeOf(cv, s)), s))).sum)
        }
        .sortBy { case (c, d) => (d, c) }.take(62).map(_._1)
      shortlist.map(c => (c, cosRef(qv, byId(c))))
        .sortBy { case (c, cos) => (-cos, c) }.take(5)
        .zipWithIndex.map { case ((c, cos), i) => (q, (i + 1).toLong, c, cos) }
    }.toSet
    val got = graft.operators.OracleVariants.knnIvfPqOracle(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"),
        BigDecimal(r.getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(got == want,
      s"only-got ${(got -- want).take(3)} only-want ${(want -- got).take(3)}")
  }

  test("cluster-topics twin assigns every vector to its argmax seed, ties to smallest") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> quantize(r.getSeq[Float](1)))
      .toIndexedSeq.sortBy(_._1)
    // the engine-portable hash's exact constants live in TextAnalysis —
    // read them back through the SQL fragment to avoid drift
    val frag = graft.operators.TextAnalysis.idHashSql("x")
    val nums = "\\d+".r.findAllIn(frag).map(_.toLong).toSeq
    val (ha, hp, hb) = (nums(0), nums(1), nums(2))
    def idHash(id: Long): Long = (ha * (id % hp) + hb) % hp
    val seeds = emb.map { case (id, _) => id }
      .sortBy(id => (idHash(id), id)).take(16)
    val byId = emb.toMap
    def cosD(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
      val dot = (0 until a.size).map(d => a(d) * b(d)).sum
      dot.toDouble / math.sqrt(math.max(
        a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble, 1.0))
    }
    val want = emb.map { case (id, qv) =>
      id -> seeds.map(s => (s, cosD(qv, byId(s))))
        .sortBy { case (s, c) => (-c, s) }.head._1
    }.toMap
    val got = graft.operators.CorpusStats.clusterTopicsOracleCells(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(got == want,
      s"diverging assignments: ${(got.toSet -- want.toSet).take(5)}")
  }
}
