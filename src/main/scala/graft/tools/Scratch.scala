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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) fn(spark, dir).explain("formatted")
      if (sys.env.contains("SCRATCH_SHOW")) fn(spark, dir).show(50, truncate = false)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
