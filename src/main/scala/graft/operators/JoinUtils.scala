package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join-shape utilities for cluster scale: bucketed co-located joins (no
  * shuffle at read time) and manual key salting for skew that AQE cannot
  * split (AQE's skew-join only rebalances sort-merge joins; a salted join
  * also covers aggregation-feeding joins and deliberate pre-partitioning).
  */
object JoinUtils {

  /** Write `df` as a bucketed+sorted table: co-bucketed tables with equal
    * bucket counts join WITHOUT any exchange — the shuffle is paid once at
    * write time and amortized over every subsequent join, the standard
    * layout for fact tables that are joined repeatedly on the same key. */
  def writeBucketed(df: DataFrame, warehousePath: String, table: String,
                    key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", s"$warehousePath/$table")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Inner equi-join with the left side salted over `saltFactor` sub-keys:
    * left rows scatter by a per-row nonce, right rows replicate
    * `saltFactor`×, and the join key becomes (key, salt) — a hot key's rows
    * land on `saltFactor` partitions instead of one. The salt comes from
    * `monotonically_increasing_id()` (round-robin within each input
    * partition), NOT a hash of the row's columns: hot keys are routinely
    * FULLY IDENTICAL duplicate rows (retries, log replays), and a
    * content hash sends all of them to one salt value — exactly the skew
    * the salt exists to break. The id is order-dependent, which is safe
    * here: Spark marks it nondeterministic, so the stage is INDETERMINATE
    * and a lost-executor retry re-runs the whole stage rather than mixing
    * old and recomputed map outputs (the SPARK-23207 semantics) — coarser
    * retries, never duplicated/dropped rows. Result-identical to the
    * plain join (spec-proven, including a duplicate-row corpus);
    * replication cost is `saltFactor`× the right side, so salt the side
    * with the skewed keys and keep the replicated side the smaller one. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** GROUPING SETS aggregation used by the `q_grouping_sets` gate query:
    * order totals by (status, priority), by status alone, and overall —
    * one pass, partial-aggregated before the shuffle like any groupBy. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY status, priority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grouping_sets" -> (qGroupingSets _))

  val oracle: Map[String, String] = Map(
    "q_grouping_sets" -> qGroupingSetsSql)
}
