package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r15 optimization): measurements behind this round's
  * decisions — per-round CC label-sum deltas for the three dup-graph
  * families (the convergence-aware star-entry question), early-star-entry
  * A/B on the deep family, recall-gate stage splits, and the classifier's
  * per-round job count. Not part of the library surface. */
object Probe15 {
  def main(args: Array[String]): Unit = {
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe15] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.SparkEntry.entry(spark).count()
    val mode = args.headOption.getOrElse("cc")

    // ---- per-round label-sum deltas of the PURE propagation loop on each
    // dup-graph family: the signal a convergence-aware star entry would
    // read. Also times each round so the star-entry tradeoff has numbers.
    def deltaTrace(name: String, directed: DataFrame, maxRounds: Int): Unit = {
      val edges = directed
        .unionByName(directed.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      val edgeDocs = edges.select(col("a").as("doc_id")).distinct().localCheckpoint()
      var labels = edgeDocs.select(col("doc_id"), col("doc_id").as("lbl"))
      def s(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
      var prev = s(labels)
      var r = 0
      var conv = false
      var lastDelta = java.math.BigDecimal.ZERO
      while (!conv && r < maxRounds) {
        val t0 = System.nanoTime()
        val viaNeighbors = edges.join(labels, edges("b") === labels("doc_id"))
          .select(edges("a").as("doc_id"), labels("lbl"))
        val next = labels.unionByName(viaNeighbors)
          .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint()
        r += 1
        val ns = s(next)
        val delta = prev.subtract(ns)
        val ratio =
          if (lastDelta.signum() > 0)
            delta.doubleValue() / lastDelta.doubleValue()
          else Double.NaN
        println(f"[probe15] $name round=$r delta=$delta ratio=$ratio%.3f t=${(System.nanoTime() - t0) / 1e9}%.2f s")
        conv = ns.compareTo(prev) == 0
        prev = ns
        lastDelta = delta
        labels = next
      }
      println(s"[probe15] $name CONVERGED(pureProp)=${conv} rounds=$r")
    }

    // ---- hybrid with star entry forced at round k (timing only; labels
    // checked equal against Components.minLabel)
    def hybridAt(name: String, directed: DataFrame, enterAt: Int): Unit = {
      val t0 = System.nanoTime()
      val edges = directed
        .unionByName(directed.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      val edgeDocs = edges.select(col("a").as("doc_id")).distinct().localCheckpoint()
      var labels = edgeDocs.select(col("doc_id"), col("doc_id").as("lbl"))
      def s(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
      var prev = s(labels)
      var r = 0
      var conv = false
      while (!conv && r < enterAt) {
        val viaNeighbors = edges.join(labels, edges("b") === labels("doc_id"))
          .select(edges("a").as("doc_id"), labels("lbl"))
        val next = labels.unionByName(viaNeighbors)
          .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint()
        r += 1
        val ns = s(next)
        conv = ns.compareTo(prev) == 0
        prev = ns
        labels = next
      }
      var starRounds = 0
      if (!conv) {
        val la = labels.select(col("doc_id").as("ka"), col("lbl").as("la"))
        val lb = labels.select(col("doc_id").as("kb"), col("lbl").as("lb"))
        val contracted = edges
          .join(la, col("a") === col("ka"))
          .join(lb, col("b") === col("kb"))
          .select(col("la").as("a"), col("lb").as("b"))
        val (roots, sr) = graft.operators.Components.starFixpoint(contracted)
        starRounds = sr
        val rootsR = roots.select(col("doc_id").as("rk"), col("lbl").as("root"))
        labels = labels.join(rootsR, col("lbl") === col("rk"), "left")
          .select(col("doc_id"), coalesce(col("root"), col("lbl")).as("lbl"))
      }
      val n = labels.count()
      println(f"[probe15] $name enterAt=$enterAt propRounds=$r starRounds=$starRounds rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (mode == "cc") {
      import spark.implicits._
      val chain = (1L to 300L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("a", "b")
      val knnEdges = t("knnGraph read") {
        graft.operators.Similarity.queries("knn_graph")(spark, dir)
          .filter(col("csim_e4") >= 3500)
          .select(col("src_id").as("a"), col("dst_id").as("b"))
          .localCheckpoint()
      }
      val mmEdges = t("multimodal near_dup read") {
        graft.operators.Multimodal.queries("multimodal_near_dup")(spark, dir)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .localCheckpoint()
      }
      val editEdges = t("edit pairs read") {
        graft.operators.Dedup.queries("dedup_edit")(spark, dir)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .localCheckpoint()
      }
      deltaTrace("chain300", chain, 40)
      deltaTrace("knn", knnEdges, 30)
      deltaTrace("multimodal", mmEdges, 30)
      deltaTrace("edit", editEdges, 30)
      // early-star-entry ladder on each family (warm second run per k)
      for (k <- Seq(1, 2, 3, 4, 6)) hybridAt("knn", knnEdges, k)
      for (k <- Seq(1, 2, 3, 4, 6)) hybridAt("knn", knnEdges, k)
      for (k <- Seq(1, 2, 3, 6)) hybridAt("multimodal", mmEdges, k)
      for (k <- Seq(1, 2, 3, 6)) hybridAt("edit", editEdges, k)
    }

    if (mode == "recall") {
      // knn_recall constituents (each SCRATCH_BEST2-style: warm + best of 2)
      def best2(name: String)(body: => Long): Unit = {
        val pre = spark.sparkContext.getPersistentRDDs.keySet
        def run(): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        run()
        val a = run(); val b = run()
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pre.contains(id)) rdd.unpersist(blocking = false)
        }
        println(f"[probe15] $name%-36s ${math.min(a, b)}%8.2f s (runs $a%.2f/$b%.2f)")
      }
      val S = graft.operators.Similarity
      try S.warmArtifacts(spark, dir) catch { case _: Throwable => }
      try graft.operators.Dedup.warmTruths(spark, dir) catch { case _: Throwable => }
      try graft.operators.Dedup.warmClusterLabels(spark, dir) catch { case _: Throwable => }
      best2("knn_recall FULL")(S.queries("knn_recall")(spark, dir).count())
      best2("  knn_ivf")(S.queries("knn_ivf")(spark, dir).count())
      best2("  knn_ivfpq(np2+np4=2x)")(S.queries("knn_ivfpq")(spark, dir).count())
      best2("  knn_pq")(S.queries("knn_pq")(spark, dir).count())
      best2("  embed_hard_negatives")(S.queries("embed_hard_negatives")(spark, dir).count())
      best2("  knn_hamming")(S.queries("knn_hamming")(spark, dir).count())
      best2("  knn_hamming_rerank")(S.queries("knn_hamming_rerank")(spark, dir).count())
      best2("  bruteTruth read")(S.bruteTruth(spark, dir).count())
      best2("dedup_recall FULL")(graft.operators.Dedup.queries("dedup_recall")(spark, dir).count())
      best2("  dedup_minhash")(graft.operators.Dedup.queries("dedup_minhash")(spark, dir).count())
      best2("  dedup_simhash")(graft.operators.Dedup.queries("dedup_simhash")(spark, dir).count())
      best2("  dedup_containment")(graft.operators.Dedup.queries("dedup_containment")(spark, dir).count())
      best2("  corpus_fuzzy_decontaminate")(graft.operators.Dedup.queries("corpus_fuzzy_decontaminate")(spark, dir).count())
    }

    if (mode == "bfs") {
      // A/B the r15 one-exchange BFS round against the r14
      // distinct+anti-join form (copied here verbatim), alternating in one
      // session per the repo's mover-adjudication discipline; also print
      // one round-2 `next` plan per variant for the plans/ evidence.
      val R = graft.operators.GraphOps.HarmonicUsersRadius
      val pairs = graft.operators.GraphOps.coActivityEdges(spark, dir)
        .select(col("a"), col("b")).localCheckpoint()
      def oldForm(explain2: Boolean): Long = {
        val bi = pairs.select(col("a").as("n1"), col("b").as("n2"))
          .unionAll(pairs.select(col("b").as("a"), col("a").as("b"))
            .select(col("a").as("n1"), col("b").as("n2")))
          .localCheckpoint()
        val seed = bi.select(col("n1").as("src")).distinct()
          .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
          .localCheckpoint()
        val fronts = scala.collection.mutable.ArrayBuffer(seed)
        var frontier = seed
        var prev: DataFrame = null
        var d = 0L
        while (d < R && !frontier.isEmpty) {
          val guard =
            if (prev == null) frontier
            else frontier.select(col("src"), col("node"))
              .unionAll(prev.select(col("src"), col("node")))
          val nextLazy = bi.join(frontier, col("n1") === col("node"))
            .select(col("src"), col("n2").as("node")).distinct()
            .join(guard.select(col("src"), col("node")), Seq("src", "node"), "left_anti")
            .withColumn("dist", lit(d + 1L))
          if (explain2 && d == 1) nextLazy.explain("formatted")
          val next = nextLazy.localCheckpoint()
          fronts += next
          prev = frontier
          frontier = next
          d += 1
        }
        fronts.reduce(_ unionAll _).filter(col("dist") > 0)
          .groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("n_reach"),
            sum(expr("1000000 DIV dist")).as("harmonic_e6"))
          .count()
      }
      def cleanup(pre: Set[Int])(body: => Long): Double = {
        val t0 = System.nanoTime(); body
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pre.contains(id)) rdd.unpersist(blocking = false)
        }
        t
      }
      if (args.contains("explain")) {
        println("==== OLD round-2 plan ====")
        oldForm(explain2 = true)
        println("==== NEW round-2 plan ====")
        // replicate GraphOps.harmonicTruncated's r15 round body verbatim to
        // print the lazy round-2 plan (the production loop pins each round,
        // so the query-level dump shows only the final composition)
        val bi = pairs.select(col("a").as("n1"), col("b").as("n2"))
          .unionAll(pairs.select(col("b").as("n1"), col("a").as("n2")))
          .localCheckpoint()
        val seed = bi.select(col("n1").as("src")).distinct()
          .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
          .localCheckpoint()
        var frontier = seed
        var prev: DataFrame = null
        var d = 0L
        while (d < 2) {
          val guard =
            if (prev == null) frontier
            else frontier.select(col("src"), col("node"))
              .unionAll(prev.select(col("src"), col("node")))
          val nextLazy = bi.join(frontier, col("n1") === col("node"))
            .select(col("src"), col("n2").as("node"), lit(0).as("vis"))
            .unionAll(guard.select(col("src"), col("node"), lit(1).as("vis")))
            .groupBy(col("src"), col("node"))
            .agg(max(col("vis")).as("vis"))
            .filter(col("vis") === 0)
            .select(col("src"), col("node"), lit(d + 1L).as("dist"))
          if (d == 1) nextLazy.explain("formatted")
          val next = nextLazy.localCheckpoint()
          prev = frontier
          frontier = next
          d += 1
        }
      }
      val pre = spark.sparkContext.getPersistentRDDs.keySet.toSet
      cleanup(pre)(oldForm(false)) // warm both paths once
      cleanup(pre)(graft.operators.GraphOps.harmonicTruncated(pairs, R).count())
      for (i <- 1 to 3) {
        val tn = cleanup(pre)(graft.operators.GraphOps.harmonicTruncated(pairs, R).count())
        val to = cleanup(pre)(oldForm(false))
        println(f"[probe15] bfs A/B iter=$i new=$tn%.2f s old=$to%.2f s")
      }
    }

    if (mode == "recall2") {
      // HISTORICAL (r15): this mode A/B'd a shared-pinned ivfpq
      // codes-scan inside knn_recall against the all-lazy two-setting
      // form. Measured alternating: shared-pinned 4.75/4.26/3.80 s vs
      // all-lazy 4.15/3.91/3.58 s — the pin LOST (AQE runtime exchange
      // reuse already dedupes the branches inside the gate's single
      // action), so the helper was removed and production keeps the
      // all-lazy form; this mode now just times the production gate.
      import graft.operators.Similarity
      try Similarity.warmArtifacts(spark, dir) catch { case _: Throwable => }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        Similarity.queries("knn_recall")(spark, dir).count()
        println(f"[probe15] recall2 gate iter=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    if (mode == "lsh") {
      // A/B the r15 ids-only LSH bucket join against the r14 form that
      // carried both embeddings through the (tbl, bucket) exchange and
      // paid the cosine per duplicate candidate.
      import graft.operators.Similarity
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val numPlanes = Similarity.planesForCorpus(Similarity.corpusCount(spark, dir))
      val numTables = 3
      def bucketed = (0 until numTables).foldLeft(emb) { (df, t) =>
        df.withColumn(s"b$t",
          Similarity.bucketOfAt(Similarity.asDouble(col("embedding")), numPlanes, 64, t * numPlanes))
      }
      def oldForm(): Long = {
        val tagged = bucketed.select(
          posexplode(array((0 until numTables).map(t => col(s"b$t")): _*)).as(Seq("tbl", "bucket")),
          col("vec_id"), col("embedding"))
        val probed = tagged.select(col("tbl"),
          explode(array(col("bucket") +: (0 until numPlanes)
            .map(p => col("bucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"),
          col("vec_id").as("id_a"), col("embedding").as("vec_a"))
        val exact = tagged.select(col("tbl"), col("bucket"),
          col("vec_id").as("id_b"), col("embedding").as("vec_b"))
        probed.join(exact, Seq("tbl", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(Similarity.cosine(col("vec_a"), col("vec_b")), 6).as("cos"))
          .distinct()
          .filter(col("cos") > 0.35)
          .count()
      }
      def newForm(): Long =
        Similarity.dedupEmbedLshWith(spark, dir, numPlanes, numTables).count()
      oldForm(); newForm() // warm
      for (i <- 1 to 3) {
        def t(body: => Long): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val tn = t(newForm()); val to = t(oldForm())
        println(f"[probe15] lsh A/B iter=$i new=$tn%.2f s old=$to%.2f s")
      }
    }

    if (mode == "jobs") {
      // per-query Spark job count (is corpus_quality_classifier still one
      // fused job per round?)
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      })
      for (q <- args.drop(2)) {
        graft.SparkEntry.queries(q)(spark, dir).count() // warm
        Thread.sleep(300)
        counter.set(0)
        graft.SparkEntry.queries(q)(spark, dir).count()
        Thread.sleep(300)
        println(s"[probe15] jobs($q) = ${counter.get()}")
      }
    }

    spark.stop()
  }
}
