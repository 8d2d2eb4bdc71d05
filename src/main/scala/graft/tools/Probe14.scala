package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r14 optimization): stage-split timings for the CC-fixpoint
  * consumers. Not part of the library surface. */
object Probe14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.SparkEntry.entry(spark).count()

    {
      import spark.implicits._
      val chain = (1L to 300L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("a", "b")
      val (l, r) = t("minLabel(chain300)") {
        val x = graft.operators.Components.minLabelWithRounds(chain)
        x._1.count(); x
      }
      val bad = l.filter(col("lbl") =!= 1L).count()
      println(s"[probe] chain300 rounds=$r nonMinLabels=$bad")
    }

    // multimodal_clusters stages
    val blobs = graft.operators.Multimodal.queries("multimodal_dedup")
    t("multimodal_dedup (exact agg)") { blobs(spark, dir).count() }
    val near = t("near_dup pairs") {
      graft.operators.Multimodal.queries("multimodal_near_dup")(spark, dir)
        .localCheckpoint()
    }
    val ne = near.select(col("id_a").as("a"), col("id_b").as("b"))
    val (lbl, rounds) = t("minLabel(nearEdges only)") {
      val (l, r) = graft.operators.Components.minLabelWithRounds(ne)
      l.count()
      (l, r)
    }
    println(s"[probe] minLabel near rounds=$rounds")
    t("multimodal_clusters full") {
      graft.operators.Multimodal.queries("multimodal_clusters")(spark, dir).count()
    }
    t("multimodal_clusters full(2)") {
      graft.operators.Multimodal.queries("multimodal_clusters")(spark, dir).count()
    }

    // embed_clusters stages
    val g = t("knnGraph read") {
      graft.operators.Similarity.queries("knn_graph")(spark, dir).localCheckpoint()
    }
    val edges = g.filter(col("csim_e4") >= 3500)
      .select(col("src_id").as("a"), col("dst_id").as("b"))
    val (l2, r2) = t("minLabel(knn edges)") {
      val (l, r) = graft.operators.Components.minLabelWithRounds(edges)
      l.count()
      (l, r)
    }
    println(s"[probe] minLabel knn rounds=$r2")
    t("embed_clusters full") {
      graft.operators.Similarity.queries("embed_clusters")(spark, dir).count()
    }

    // graph_harmonic_users stages
    val coe = t("coActivityEdges read") {
      graft.operators.GraphOps.coActivityEdges(spark, dir).localCheckpoint()
    }
    println(s"[probe] coActivity pairs=${coe.count()}")
    t("harmonicTruncated(ball)") {
      graft.operators.GraphOps.harmonicTruncated(
        coe.select(col("a"), col("b")), graft.operators.GraphOps.HarmonicUsersRadius).count()
    }
    t("events distinct users") {
      graft.sources.Tables.events(spark, dir).select(col("user_id")).distinct().count()
    }
    t("graph_harmonic_users full") {
      graft.operators.GraphOps.queries("graph_harmonic_users")(spark, dir).count()
    }
    t("graph_harmonic_users full(2)") {
      graft.operators.GraphOps.queries("graph_harmonic_users")(spark, dir).count()
    }

    // pure one-hop propagation rounds-to-convergence on the knn dup graph
    // (the diameter question: would a larger PropRoundBudget beat the
    // hybrid's contraction+star tail for this graph family?)
    {
      val sym = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      val docs = sym.select(col("a").as("doc_id")).distinct().localCheckpoint()
      var labels = docs.select(col("doc_id"), col("doc_id").as("lbl"))
      def s(df: org.apache.spark.sql.DataFrame) =
        df.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
      var prev = s(labels)
      var r = 0
      var conv = false
      val t0 = System.nanoTime()
      while (!conv && r < 40) {
        val nxt = labels.unionByName(
            sym.join(labels, sym("b") === labels("doc_id"))
              .select(sym("a").as("doc_id"), labels("lbl")))
          .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint()
        r += 1
        val ns = s(nxt)
        conv = ns == prev
        prev = ns
        labels = nxt
      }
      println(f"[probe] pureProp knn rounds=$r t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
