package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one or more SparkEntry queries by name and print their
  * formatted plans. Usage: runMain graft.tools.Scratch <sfDir> <query>...
  * (defaults: sf0.1, all queries). Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val explain = sys.env.contains("SCRATCH_EXPLAIN")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // warm-up
    // Bench-mirroring methodology (r14): per-execution cleanup of the
    // checkpoint blocks this run created (Scratch sessions otherwise
    // accumulate pinned blocks and later queries read progressively
    // slower), plus an optional discarded warm-up + best-of-2 timed pair
    // (SCRATCH_BEST2=1) so numbers compare to Bench's.
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
      (t, n)
    }
    val best2 = sys.env.contains("SCRATCH_BEST2")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) fn(spark, dir).explain("formatted")
      if (sys.env.contains("SCRATCH_SHOW")) fn(spark, dir).show(50, truncate = false)
      val (t, n) =
        if (best2) {
          run1(name, fn) // warm-up, discarded
          val (t1, n1) = run1(name, fn)
          val (t2, _) = run1(name, fn)
          (math.min(t1, t2), n1)
        } else run1(name, fn)
      println(f"[scratch] $name%-24s $t%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
