package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicate the sf0.1 tables k× (shifting keys so
  * cardinality grows too) and time the heavy operators, to observe the
  * scaling exponent rather than guess it. Dev tool, not library surface. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def rep(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until k).map { i =>
        keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * 10000000L)))
      }.reduce(_ unionByName _)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }

    val ev = rep(graft.sources.Tables.events(spark, dir), Seq("user_id", "event_id"))
    val li = rep(graft.sources.Tables.lineitem(spark, dir), Seq("l_orderkey"))
    val docs = rep(graft.sources.Tables.documents(spark, dir), Seq("doc_id"))

    time(s"q1_agg x$k")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), avg(col("l_extendedprice"))).count())

    time(s"ft_latest x$k")(graft.operators.LatestValue.latest(
      ev, Seq("user_id"), Seq("ts", "event_id"),
      Seq("ts", "event_id", "value")).count())

    val entity = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("entity_ts"), col("event_id").as("row_id"))
    val feats = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    time(s"pit_join x$k")(graft.operators.PointInTimeJoin.asof(
      entity, feats, Seq("user_id"), "entity_ts", "ts", Seq("value")).count())
    time(s"pit_bucketed x$k")(graft.operators.PointInTimeJoin.asofBucketed(
      entity, feats, Seq("user_id"), "entity_ts", "ts", Seq("value"), 86400L).count())

    spark.stop()
  }
}
