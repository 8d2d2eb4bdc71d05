package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-join analytics shapes beyond [[Analytics]]: dual-role dimension
  * joins (TPC-H Q7), decorrelated per-group-average filters (Q17) and
  * anti-joins against broadcast global thresholds (Q22). Each query's
  * money/quantity gate columns are exact integers (price cents × discount
  * hundredths), so every aggregate is order-independent BIGINT math in
  * both engines — no float rounding anywhere.
  *
  * Reference semantics: these are the warehouse-side retrieval shapes the
  * feast-0.9-era companion batch jobs ran next to the registry
  * (core/src/main/java/feast/core/model/FeatureTable.java batch sources);
  * expressed Spark-first as declarative plans Catalyst can reorder.
  */
object AnalyticsJoins {

  /** Exact integral revenue in 1e-4 dollar units:
    * cents(extendedprice) × (100 − hundredths(discount)). Both factors are
    * exact by data contract (2-dp money, 2-dp discount — integrality
    * asserted in Round7OpsSpec), so the product is plain BIGINT math and
    * every downstream sum is order-independent in both engines. */
  private def revE4: org.apache.spark.sql.Column =
    (round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4")

  /** TPC-H-Q7-shaped volume shipping: revenue between (supplier nation →
    * customer nation) pairs by ship year, cross-border only.
    *
    * The nation dim joins BOTH fact sides under two roles (supp_nation /
    * cust_nation) — the classic dual-role dimension. Plan shape: supplier
    * ⋈ nation and customer ⋈ nation are broadcast (the supplier side
    * explicitly — it is dim-sized at any SF; the customer side is left to
    * Catalyst/AQE, which broadcasts at test scale and demotes to shuffle
    * when customers outgrow the threshold). The only unavoidable exchange
    * is lineitem ⋈ orders on orderkey — a fact-fact join AQE plans as SMJ
    * at real scale; the cross-nation filter cannot prune it because both
    * sides are needed to decide the pair. */
  def qNationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val supN = Tables.supplier(spark, dir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_suppkey"), revE4,
      year(col("l_shipdate")).cast("long").as("ship_year"))
    li.join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_e4")).as("volume_e4"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  val qNationVolumeSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |      (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4,
      |    CAST(year(l_shipdate) AS BIGINT) AS ship_year
      |  FROM lineitem
      |)
      |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, ship_year,
      |  count(*) AS n_items, CAST(sum(rev_e4) AS BIGINT) AS volume_e4
      |FROM li
      |JOIN supplier s ON li.l_suppkey = s.s_suppkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |JOIN orders o ON li.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |WHERE sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H-Q17-shaped small-quantity revenue: lineitems of three brands
    * whose quantity is below 1/5 of that part's average quantity.
    *
    * The correlated subquery (avg per part) is decorrelated as a window
    * aggregate over the SAME partkey partition the filter consumes — one
    * fact scan, one partkey exchange. The groupBy-then-join-back form
    * scans lineitem twice and shuffles both scans; the window form pays
    * neither (per-part partitions are supplier-offer-sized, so the window
    * buffer is bounded). The brand filter broadcasts into the fact scan
    * and prunes BEFORE the exchange. The below-average predicate is exact
    * integer cross-multiplication (qty·5·cnt < Σqty — quantities are
    * integral by data contract), immune to avg()'s order-dependent float
    * division. */
  def qCorrelatedAgg(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    li.withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sum_qty", sum(col("qty")).over(w))
      .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("price_e2")).as("sum_price_e2"))
      .orderBy(col("p_brand"))
  }

  val qCorrelatedAggSql: String =
    """WITH li AS (
      |  SELECT p_brand, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_e2,
      |    count(*) OVER (PARTITION BY l_partkey) AS cnt,
      |    sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sum_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |)
      |SELECT p_brand, count(*) AS n_items, CAST(sum(price_e2) AS BIGINT) AS sum_price_e2
      |FROM li WHERE qty * 5 * cnt < sum_qty
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H-Q22-shaped lost-customer analysis: customers with no URGENT
    * order whose balance beats the average positive balance, by market
    * segment. (Plain "no orders at all" is vacuous in this data — every
    * customer ordered at sf ≤ 0.01 — so the anti-join side is the urgent
    * subset, which keeps the gate non-empty at every SF: 5/75/937 rows
    * survive at sf 0.001/0.01/0.1.)
    *
    * The global threshold is a single-row aggregate broadcast under every
    * customer row (crossJoin(broadcast(...)) — the decorrelated scalar
    * subquery), and "never ordered urgently" is a left_anti against the
    * filtered orders keys — Spark's native anti-join, with the priority
    * filter pushed to the orders scan. The above-average predicate is
    * exact integer cross-multiplication (bal·n > Σbal in cents), so the
    * threshold is engine-exact. */
  def qAntiAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("bal_e2"))
    val thr = cust.filter(col("bal_e2") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("bal_e2")).as("sum_pos_e2"))
    cust.crossJoin(broadcast(thr))
      .filter(col("bal_e2") * col("n_pos") > col("sum_pos_e2"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), sum(col("bal_e2")).as("sum_bal_e2"))
      .orderBy(col("c_mktsegment"))
  }

  val qAntiAggSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_e2
      |  FROM customer
      |), thr AS (
      |  SELECT count(*) AS n_pos, CAST(sum(bal_e2) AS BIGINT) AS sum_pos_e2
      |  FROM cust WHERE bal_e2 > 0
      |)
      |SELECT c_mktsegment, count(*) AS n_cust, CAST(sum(bal_e2) AS BIGINT) AS sum_bal_e2
      |FROM cust, thr
      |WHERE bal_e2 * n_pos > sum_pos_e2
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = cust.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nation_volume"  -> (qNationVolume _),
    "q_correlated_agg" -> (qCorrelatedAgg _),
    "q_anti_agg"       -> (qAntiAgg _))

  val oracle: Map[String, String] = Map(
    "q_nation_volume"  -> qNationVolumeSql,
    "q_correlated_agg" -> qCorrelatedAggSql,
    "q_anti_agg"       -> qAntiAggSql)
}
