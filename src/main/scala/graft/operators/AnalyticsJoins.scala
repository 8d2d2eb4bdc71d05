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
    * cust_nation) — the classic dual-role dimension. Plan shape: the fact
    * joins the supplier KEY projection (un-hinted — supplier is SF-LINEAR,
    * so Catalyst broadcasts it from file stats at gate SFs and demotes to
    * shuffle at scale; only the 25-row nation rename is force-broadcast),
    * and the customer side is left to Catalyst/AQE the same way. The only
    * unavoidable exchange is lineitem ⋈ orders on orderkey — a fact-fact
    * join AQE plans as SMJ at real scale; the cross-nation filter cannot
    * prune it because both sides are needed to decide the pair. */
  def qNationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val supKeys = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val custN = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_suppkey"), revE4,
      year(col("l_shipdate")).cast("long").as("ship_year"))
    li.join(supKeys, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nations.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
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
      .join(parts, col("l_partkey") === col("p_partkey"))
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

  /** TPC-H-Q14-shaped promo revenue share by ship month: what fraction of
    * each month's revenue came from PROMO-type parts.
    *
    * Plan shape: the part dim carries only (partkey, is-promo bit) into a
    * broadcast hash join — the conditional aggregate rides the ONE
    * monthly groupBy exchange, so the whole query is scan → broadcast
    * join → partial agg → final agg. Both gate sums are exact BIGINT
    * (rev_e4 integrality per [[revE4]]); the ratio gate share_bp rounds
    * an exact-integer quotient — IEEE division and HALF_UP rounding are
    * bit-identical cross-engine for integer inputs (no pow/ln anywhere),
    * and double-rounding keeps working past the 2^53 sum range where an
    * integer ×10000 cross-multiplication would ANSI-overflow. */
  def qPromoShare(spark: SparkSession, dir: String): DataFrame = {
    val promoBit = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").cast("long").as("is_promo"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), revE4,
        year(col("l_shipdate")).cast("long").as("ship_year"),
        month(col("l_shipdate")).cast("long").as("ship_month"))
      .join(promoBit, col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_year"), col("ship_month"))
      .agg(sum(col("rev_e4") * col("is_promo")).as("promo_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .withColumn("share_bp",
        round(col("promo_e4") * lit(10000.0) / col("total_e4"), 0).cast("long"))
      .orderBy(col("ship_year"), col("ship_month"))
  }

  val qPromoShareSql: String =
    """WITH li AS (
      |  SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |    CAST(month(l_shipdate) AS BIGINT) AS ship_month,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |      (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4,
      |    CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), m AS (
      |  SELECT ship_year, ship_month,
      |    CAST(sum(rev_e4 * is_promo) AS BIGINT) AS promo_e4,
      |    CAST(sum(rev_e4) AS BIGINT) AS total_e4
      |  FROM li GROUP BY 1, 2
      |)
      |SELECT ship_year, ship_month, promo_e4, total_e4,
      |  CAST(round(promo_e4 * 10000.0 / total_e4, 0) AS BIGINT) AS share_bp
      |FROM m ORDER BY 1, 2""".stripMargin

  /** TPC-H-Q15-shaped top supplier: the supplier(s) with maximum revenue
    * in a fixed quarter, ties kept.
    *
    * The revenue CTE aggregates once (the only fact exchange — the date
    * filter is pushed to the scan and prunes ~96% of lineitem first);
    * the scalar max re-enters as a one-row broadcast under every
    * supplier total (crossJoin(broadcast) — same decorrelation as
    * [[qAntiAgg]], NOT a single-partition window, which would funnel all
    * totals through one task), and the name lookup broadcasts the
    * supplier dim. At any scale the post-agg side is |suppliers| rows,
    * never fact-sized. */
  def qTopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01"))
      .filter(to_date(col("l_shipdate")) < lit("1996-04-01"))
      // explicit so BOTH consumers of rev (totals and scalar max) see the
      // byte-identical agg subtree: the name join would push this IsNotNull
      // into only its own branch, splitting the subtrees and defeating
      // ReuseExchange — with it shared, the fact is scanned ONCE
      .filter(col("l_suppkey").isNotNull)
      .select(col("l_suppkey"), revE4)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev_e4")).as("total_rev_e4"))
    val mx = rev.agg(max(col("total_rev_e4")).as("max_rev_e4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev_e4") === col("max_rev_e4"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy(col("s_suppkey"))
  }

  val qTopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |      (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS total_rev_e4
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      |  GROUP BY 1
      |)
      |SELECT s.s_suppkey, s.s_name, r.total_rev_e4
      |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  /** TPC-H-Q19-shaped disjunctive-predicate revenue: three OR'd
    * (brand, size-range, quantity-range) branches, each tying a part
    * attribute to a lineitem attribute, per brand.
    *
    * The interesting plan property is what Catalyst does with the OR:
    * the part-only disjunction (brand ∈ {12,23,3} with its size range)
    * is inferred and pushed to the part scan, shrinking the broadcast to
    * the union of the three branches BEFORE the join; the mixed
    * part×lineitem conjuncts stay as the post-join filter. A hand-rolled
    * three-scan UNION would read the fact three times for the same
    * answer. */
  def qDisjunctFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"), revE4)
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("qty").between(1, 30)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(16, 30) && col("qty").between(10, 40)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(31, 50) && col("qty").between(20, 50)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_e4")).as("rev_e4"))
      .orderBy(col("p_brand"))
  }

  val qDisjunctFilterSql: String =
    """SELECT p_brand, count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |    (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS rev_e4
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 30)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
      |       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 40)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
      |       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 50)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H-Q18-shaped large-volume orders: orders whose total quantity
    * exceeds 300 units, with their customer.
    *
    * The HAVING subquery is an aggregate on the SAME key the join-back
    * consumes — groupBy(orderkey) then join orders on orderkey, so the
    * agg output's hash partitioning is reused by the join (no second
    * exchange of the filtered side). The >300 filter is ~0.1%-selective
    * at every SF, so AQE sees a tiny build side and demotes the
    * fact-fact join to broadcast at runtime — but the plan stays correct
    * as SMJ when the survivor set outgrows the threshold at cluster
    * scale. Customer lookup is dim-sized. 5/46/473 orders survive at
    * sf 0.001/0.01/0.1. */
  def qBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_e2"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("price_e2"), col("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  val qBigOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300
      |)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      |  CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS price_e2, b.sum_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** TPC-H-Q16-shaped supplier variety: distinct suppliers per
    * (brand, type) over selected sizes, excluding negative-balance
    * suppliers (the "complaints" exclusion of Q16).
    *
    * Both dims broadcast (the size filter and the exclusion list are
    * pushed/applied before anything fact-sized moves), so the fact scan
    * flows join-free until the two-phase distinct aggregate — its
    * (brand, type, suppkey) partial dedup runs map-side, which is what
    * bounds the exchange at cluster scale: the shuffle carries unique
    * triples, not lineitems. The anti-join is Spark's native left_anti
    * over a broadcast keyset, never a NOT IN re-scan. */
  def qSupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val pt = Tables.part(spark, dir)
      .filter(col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  val qSupplierVarietySql: String =
    """SELECT p_brand, p_type,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  /** TPC-H-Q21-shaped sole-blame supplier: on orders involving several
    * suppliers, the one supplier whose lineitems came back flagged 'R'
    * while every other supplier's did not — counted per supplier.
    *
    * Q21's EXISTS (another supplier on the order) / NOT EXISTS (another
    * 'R' supplier) pair is the classic double correlated subquery; both
    * decorrelate into window aggregates over the SAME orderkey partition
    * ([[qCorrelatedAgg]]'s discipline, applied twice): per (order,
    * supplier) pairs collapse first (map-side partial agg — the shuffle
    * carries unique pairs, not lineitems), then ONE orderkey window
    * derives n_supp and n_r, and the filter has_r=1 ∧ n_supp≥2 ∧ n_r=1
    * IS the sole-blame predicate. Two bounded exchanges replace the
    * textbook triple self-join of the fact table; the oracle deliberately
    * keeps the EXISTS form, so the gate cross-proves the decorrelation. */
  def qSoleBlame(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_r"))
    val w = Window.partitionBy(col("l_orderkey"))
    pairs
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_r", sum(col("has_r")).over(w))
      .filter(col("has_r") === 1 && col("n_supp") >= 2 && col("n_r") === 1)
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val qSoleBlameSql: String =
    """WITH r AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      |  WHERE l_returnflag = 'R'
      |)
      |SELECT s.s_name, count(*) AS numwait
      |FROM r
      |JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = r.l_orderkey
      |      AND l2.l_suppkey <> r.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = r.l_orderkey
      |      AND l3.l_suppkey <> r.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** TPC-H-Q8-shaped market share: of the revenue one region's customers
    * spent on one part type, the fraction supplied by one nation, by
    * order year.
    *
    * The selective part-type filter prunes the fact FIRST through a
    * keys-only broadcast — lineitems surviving ~1/6 selection enter the
    * orderkey fact-fact join (the only real exchange; SMJ at scale), and
    * the region restriction rides the customer dim join, never a
    * post-hoc filter on joined fact rows. The share is the same
    * exact-integer conditional-sum + IEEE-division gate as
    * [[qPromoShare]] — numerator and denominator aggregate in ONE pass
    * (a separate filtered aggregate would re-scan). */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val asiaKey = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
    val asiaCust = Tables.customer(spark, dir)
      .join(broadcast(nations.join(asiaKey,
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    // part/supplier sides are SF-LINEAR — un-hinted (file-size stats
    // broadcast them at gate SFs, AQE decides at scale); only the 25-row
    // nation rename keeps a forced hint
    val supKeys = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val stdParts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revE4)
      .join(stdParts, col("l_partkey") === col("p_partkey"))
      .join(supKeys, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nations.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("order_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("order_year"))
      .agg(sum(when(col("supp_nation") === "NATION_7", col("rev_e4"))
          .otherwise(0L)).as("nation_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .withColumn("share_bp",
        round(col("nation_e4") * lit(10000.0) / col("total_e4"), 0).cast("long"))
      .orderBy(col("order_year"))
  }

  val qMarketShareSql: String =
    """WITH f AS (
      |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) *
      |      (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS rev_e4,
      |    sn.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_custkey IN (
      |    SELECT c_custkey FROM customer c
      |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |    JOIN region r ON cn.n_regionkey = r.r_regionkey
      |    WHERE r.r_name = 'ASIA')
      |), y AS (
      |  SELECT order_year,
      |    CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4 ELSE 0 END)
      |      AS BIGINT) AS nation_e4,
      |    CAST(sum(rev_e4) AS BIGINT) AS total_e4
      |  FROM f GROUP BY 1
      |)
      |SELECT order_year, nation_e4, total_e4,
      |  CAST(round(nation_e4 * 10000.0 / total_e4, 0) AS BIGINT) AS share_bp
      |FROM y ORDER BY 1""".stripMargin

  /** TPC-H-Q10-shaped returned-item reporting: the 20 customers who
    * returned the most revenue in a quarter.
    *
    * Both scan filters (returnflag, order-date window) push to parquet,
    * so the orderkey fact-fact join sees only the quarter's returned
    * lines; revenue collapses to customer grain BEFORE any dim joins
    * (|custkeys-with-returns| rows carry forward, never lineitems), and
    * the top-20 is a TakeOrdered over that aggregate — no global sort.
    * The LIMIT boundary is made deterministic by the (lost_e4 desc,
    * custkey) total order; bal_e2/lost_e4 are exact integers. */
  def qReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revE4)
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1995-01-01"))
      .filter(to_date(col("o_orderdate")) < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_e4")).as("lost_e4"), count(lit(1)).as("n_items"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"),
          col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_e2")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("bal_e2"),
        col("lost_e4"), col("n_items"))
      .orderBy(col("lost_e4").desc, col("c_custkey"))
      .limit(20)
  }

  val qReturnedItemsSql: String =
    """WITH lost AS (
      |  SELECT o.o_custkey,
      |    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) *
      |      (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
      |      AS lost_e4,
      |    count(*) AS n_items
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_returnflag = 'R'
      |    AND CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
      |    AND CAST(o.o_orderdate AS DATE) < DATE '1995-04-01'
      |  GROUP BY 1
      |)
      |SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal_e2,
      |  t.lost_e4, t.n_items
      |FROM lost t
      |JOIN customer c ON t.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |ORDER BY t.lost_e4 DESC, c.c_custkey LIMIT 20""".stripMargin

  /** Market-basket part affinity: top-20 part pairs by lift among parts
    * co-purchased in the same order (min support 3 co-occurrences) — the
    * association-rules staple. Lift = n·c12/(c1·c2), emitted e4 via
    * EXACT integer half-up division — (2·num + den) div (2·den) — because
    * ratios of small counts land on .5 boundaries routinely (measured:
    * 55237.5 at sf0.001), so a float round() would be engine-lottery
    * there; integer division has no boundary. The BIGINT products bound
    * the basket count at ~3·10⁷ under ANSI; past that a production run
    * emits the raw counts and leaves the ratio to the consumer (or
    * 128-bit math). Ordering is total (lift, part_a, part_b) so LIMIT is
    * deterministic.
    *
    * Scale shape: everything runs at the distinct (order, part) grain.
    * The basket-size cap (≤100 distinct parts) rides a count window on
    * the pair join's own orderkey exchange — a pathological basket can't
    * go quadratic, the dedup_ngram df-cap discipline. Pair counts
    * partial-aggregate; supports and the order count join back as
    * broadcasts of part-grain aggregates. */
  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val wB = Window.partitionBy(col("l_orderkey"))
    // capped feeds FOUR consumers (both pair sides, supports, the order
    // count): materialize the 2-long-column grain once instead of four
    // fact scans — the knn_recall baseline discipline
    val capped = items.withColumn("bs", count(lit(1)).over(wB))
      .filter(col("bs") <= 100).drop("bs")
      .localCheckpoint()
    val supp = capped.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val nOrders = capped.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 3)
    val s1 = supp.select(col("l_partkey").as("part_a"), col("c").as("c1"))
    val s2 = supp.select(col("l_partkey").as("part_b"), col("c").as("c2"))
    pairs.join(s1, "part_a").join(s2, "part_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_e4",
        expr("(2 * c12 * n_orders * 10000 + c1 * c2) div (2 * c1 * c2)"))
      .select(col("part_a"), col("part_b"), col("c12"), col("c1"),
        col("c2"), col("lift_e4"))
      .orderBy(col("lift_e4").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  val qBasketPairsSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), capped AS (
      |  SELECT l_orderkey, l_partkey FROM (
      |    SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS bs FROM items
      |  ) WHERE bs <= 100
      |), supp AS (
      |  SELECT l_partkey, count(*) AS c FROM capped GROUP BY 1
      |), n AS (
      |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM capped
      |), pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c12
      |  FROM capped a JOIN capped b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3
      |)
      |SELECT p.part_a, p.part_b, CAST(p.c12 AS BIGINT) AS c12,
      |  CAST(s1.c AS BIGINT) AS c1, CAST(s2.c AS BIGINT) AS c2,
      |  CAST((2 * p.c12 * n.n_orders * 10000 + s1.c * s2.c)
      |    // (2 * s1.c * s2.c) AS BIGINT) AS lift_e4
      |FROM pairs p
      |JOIN supp s1 ON p.part_a = s1.l_partkey
      |JOIN supp s2 ON p.part_b = s2.l_partkey
      |CROSS JOIN n
      |ORDER BY lift_e4 DESC, part_a, part_b LIMIT 20""".stripMargin

  /** Customer revenue deciles — the wallet-segmentation report, done with
    * the SCALABLE ntile: a naive `ntile(10) OVER (ORDER BY rev)` is a
    * single global sort partition holding every customer (the
    * corpus_ppl_bucket problem on the customer domain). Instead customers
    * aggregate to $100 revenue BINS (cardinality bounded by the VALUE
    * RANGE, not the customer count), cumulative counts run over bins, a
    * bin's decile = cum_before·10 DIV n_total, and equal-revenue-bin
    * customers share fate by construction (a tie-split ntile is
    * nondeterministic across engines anyway). Customers without orders
    * count at revenue 0 — decile 0 must hold the inactive mass, or the
    * report overstates the low deciles' spend.
    *
    * All money exact integer cents (2-dp contract); per-decile avg is the
    * truncating DIV. Plan: one custkey exchange for the revenue rollup,
    * then everything is bin/decile-grain. */
  def qRevenueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir).select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(coalesce(sum(col("cents")), lit(0L)).as("rev_c"))
      .withColumn("bin", expr("rev_c DIV 10000"))
    val bins = rev.groupBy(col("bin"))
      .agg(count(lit(1)).as("bin_n"), sum(col("rev_c")).as("bin_rev"))
    val w = Window.orderBy(col("bin")) // bin-grain rows only: value-range bounded
    bins
      .withColumn("cum_before",
        coalesce(sum(col("bin_n")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_total", sum(col("bin_n")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("decile", expr("cum_before * 10 DIV n_total"))
      .groupBy(col("decile"))
      .agg(sum(col("bin_n")).as("n_customers"), sum(col("bin_rev")).as("sum_rev_c"))
      .withColumn("avg_rev_c", expr("sum_rev_c DIV n_customers"))
      .orderBy(col("decile"))
  }

  val qRevenueDecilesSql: String =
    """WITH rev AS (
      |  SELECT c.c_custkey,
      |    CAST(coalesce(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0)
      |      AS BIGINT) AS rev_c
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1
      |), bins AS (
      |  SELECT rev_c // 10000 AS bin, CAST(count(*) AS BIGINT) AS bin_n,
      |    CAST(sum(rev_c) AS BIGINT) AS bin_rev
      |  FROM rev GROUP BY 1
      |), cum AS (
      |  SELECT bin, bin_n, bin_rev,
      |    CAST(coalesce(sum(bin_n) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before,
      |    CAST(sum(bin_n) OVER () AS BIGINT) AS n_total
      |  FROM bins
      |)
      |SELECT CAST(cum_before * 10 // n_total AS BIGINT) AS decile,
      |  CAST(sum(bin_n) AS BIGINT) AS n_customers,
      |  CAST(sum(bin_rev) AS BIGINT) AS sum_rev_c,
      |  CAST(sum(bin_rev) // sum(bin_n) AS BIGINT) AS avg_rev_c
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** Year-over-year revenue growth per customer nation — the BI growth
    * report (which markets grow, which shrink): per (nation, year) exact
    * revenue cents from the order grain, YoY delta via lag over the
    * nation's year series, growth in bp of the PRIOR year (the sign
    * convention finance reads; first year has no prior → NULL in both
    * engines). The window runs over (nation, year) aggregate rows —
    * nations × years grain, never facts. */
  def qYearlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("yr"))
      .agg(sum(col("cents")).as("rev_c"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("nation")).orderBy(col("yr"))
    rev.withColumn("prev_rev_c", lag(col("rev_c"), 1).over(w))
      .select(col("nation"), col("yr"), col("rev_c"), col("n_orders"),
        col("prev_rev_c"),
        expr("(rev_c - prev_rev_c) * 10000 DIV prev_rev_c").as("growth_bp"))
      .orderBy(col("nation"), col("yr"))
  }

  val qYearlyGrowthSql: String =
    """WITH rev AS (
      |  SELECT n.n_name AS nation,
      |    CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS rev_c,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |)
      |SELECT nation, yr, rev_c, n_orders,
      |  lag(rev_c) OVER (PARTITION BY nation ORDER BY yr) AS prev_rev_c,
      |  CAST((rev_c - lag(rev_c) OVER (PARTITION BY nation ORDER BY yr))
      |    * 10000 // lag(rev_c) OVER (PARTITION BY nation ORDER BY yr)
      |    AS BIGINT) AS growth_bp
      |FROM rev ORDER BY nation, yr""".stripMargin

  /** Order-priority mix per year (the TPC-H Q4 FAMILY's reporting shape
    * on the columns this dataset carries — commitdate is absent, the
    * priority×year mix is the expressible member): per (year, priority)
    * order count, exact revenue cents, and the share of the year's
    * orders in bp; one (yr, priority) partial-aggregated exchange, the
    * share window at years×priorities grain. */
  def qPriorityMix(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("yr"), col("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_c"))
    val w = Window.partitionBy(col("yr"))
    agg.withColumn("yr_orders", sum(col("n_orders")).over(w))
      .select(col("yr"), col("priority"), col("n_orders"), col("rev_c"),
        expr("n_orders * 10000 DIV yr_orders").as("share_bp"))
      .orderBy(col("yr"), col("priority"))
  }

  val qPriorityMixSql: String =
    """WITH agg AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    o_orderpriority AS priority,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT yr, priority, n_orders, rev_c,
      |  CAST(n_orders * 10000 //
      |    (sum(n_orders) OVER (PARTITION BY yr)) AS BIGINT) AS share_bp
      |FROM agg ORDER BY yr, priority""".stripMargin

  /** Repeat- and returning-customer rates per year — the loyalty report
    * beside [[qYearlyGrowth]]'s volume view (growth from NEW wallets vs
    * the same wallets buying again are different businesses): per year,
    * active customers, repeat customers (≥2 orders that year) and
    * returning customers (also active the PRIOR year — via lag over each
    * customer's active-year series, the events_lifecycle rule on the
    * customer×year grain), with both rates in exact bp. One (custkey,
    * year) partial-aggregated exchange; the lag window rides the
    * customer-grain rows. */
  def qRepeatCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cy = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .groupBy(col("o_custkey"), col("yr")).agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("yr"))
    cy.withColumn("prev_yr", lag(col("yr"), 1).over(w))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"),
        sum(when(col("prev_yr") === col("yr") - 1, 1L).otherwise(0L)).as("n_returning"))
      .select(col("yr"), col("n_active"), col("n_repeat"), col("n_returning"),
        expr("n_repeat * 10000 DIV n_active").as("repeat_bp"),
        expr("n_returning * 10000 DIV n_active").as("returning_bp"))
      .orderBy(col("yr"))
  }

  val qRepeatCustomersSql: String =
    """WITH cy AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1, 2
      |), lagged AS (
      |  SELECT yr, n_orders,
      |    lag(yr) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_yr
      |  FROM cy
      |)
      |SELECT yr, CAST(count(*) AS BIGINT) AS n_active,
      |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
      |  CAST(sum(CASE WHEN prev_yr = yr - 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_returning,
      |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS repeat_bp,
      |  CAST(sum(CASE WHEN prev_yr = yr - 1 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS returning_bp
      |FROM lagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** Purchase-cadence distribution — days between a customer's
    * consecutive orders, bucketed (≤7 / ≤30 / ≤90 / 90+) with exact
    * per-bucket counts, share bp and mean gap days — the replenishment
    * report behind reorder nudges and churn thresholds (the order-grain
    * sibling of events_inter_arrival). Gaps via lag over each customer's
    * order dates (one custkey exchange); the histogram fold is
    * bucket-grain; day arithmetic on the epoch-day index, engine-exact. */
  def qOrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        floor(unix_micros(col("o_orderdate")) / lit(86400000000L))
          .cast("long").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .filter(col("gap").isNotNull)
    val bucket = when(col("gap") <= 7, "a_week")
      .when(col("gap") <= 30, "b_month")
      .when(col("gap") <= 90, "c_quarter")
      .otherwise("d_longer")
    val agg = gaps.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sum_days"))
    val tot = agg.agg(sum(col("n_gaps")).as("total"))
    agg.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_gaps"),
        expr("sum_days DIV n_gaps").as("mean_gap_days"),
        expr("n_gaps * 10000 DIV total").as("share_bp"))
      .orderBy(col("bucket"))
  }

  val qOrderGapsSql: String =
    """WITH g AS (
      |  SELECT o_custkey,
      |    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
      |    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
      |      - lag(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT))
      |        OVER (PARTITION BY o_custkey ORDER BY
      |          CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT),
      |          o_orderkey) AS gap
      |  FROM orders
      |), b AS (
      |  SELECT CASE WHEN gap <= 7 THEN 'a_week'
      |    WHEN gap <= 30 THEN 'b_month'
      |    WHEN gap <= 90 THEN 'c_quarter' ELSE 'd_longer' END AS bucket,
      |    gap
      |  FROM g WHERE gap IS NOT NULL
      |), agg AS (
      |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS sum_days
      |  FROM b GROUP BY 1
      |), tot AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS total FROM agg)
      |SELECT bucket, n_gaps,
      |  CAST(sum_days // n_gaps AS BIGINT) AS mean_gap_days,
      |  CAST(n_gaps * 10000 // total AS BIGINT) AS share_bp
      |FROM agg CROSS JOIN tot ORDER BY bucket""".stripMargin

  /** Skyline / Pareto front (Börzsönyi et al., ICDE'01) over the part
    * catalog — "no part is both cheaper and bigger": the multi-criteria
    * shortlist query (cheapest-per-capability procurement, price-vs-
    * quality vendor review) no single ORDER BY can express. Minimize
    * price, maximize size; a (price, size) point survives iff no other
    * point is ≤ price AND ≥ size with one strict.
    *
    * The 2-D skyline is a PREFIX-MAX under (price asc, size desc) order —
    * a point survives iff its size strictly exceeds every earlier
    * point's — so the operator is the corpus_token_budget carry-in
    * discipline, not a dominance self-join: distinct (price, size) pairs
    * bucket into ≤1024 monotone price ranges, per-bucket maxes ride a
    * tiny aggregate whose strictly-earlier prefix-max broadcasts back as
    * each bucket's carry-in, and the within-bucket prefix-max windows run
    * 1024-way parallel. O(n log n) work, one pair-grain exchange, NO n²
    * join anywhere (the oracle deliberately computes the NAIVE NOT-EXISTS
    * dominance — an independent algorithm cross-proving the prefix-max
    * reduction). Exact integers: price in cents (2-dp contract). */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    qSkylineOf(Tables.part(spark, dir))

  def qSkylineOf(part: DataFrame): DataFrame = {
    val pairs = part
      .select(round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").cast("long").as("p_size"))
      .groupBy(col("price_c"), col("p_size")).agg(count(lit(1)).as("n_parts"))
    val mx = pairs.agg(max(col("price_c")).as("pmax"))
    val bucketed = pairs.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("price_c * 1024 DIV (pmax + 1)"))
    // ≤1024 rows reach this aggregate; the unpartitioned window over it
    // is bounded by construction (the token_budget carry-in discipline)
    val wB = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.groupBy(col("bucket")).agg(max(col("p_size")).as("bmax"))
      .withColumn("carry_max", coalesce(max(col("bmax")).over(wB), lit(-1L)))
      .select(col("bucket"), col("carry_max"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("price_c"), col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(carry), Seq("bucket"))
      .withColumn("run_max",
        greatest(coalesce(max(col("p_size")).over(wIn), lit(-1L)), col("carry_max")))
      .filter(col("p_size") > col("run_max"))
      .select(col("price_c"), col("p_size"), col("n_parts"))
      .orderBy(col("price_c"))
  }

  val qSkylineSql: String =
    """WITH pr AS (
      |  SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
      |    CAST(p_size AS BIGINT) AS p_size, CAST(count(*) AS BIGINT) AS n_parts
      |  FROM part GROUP BY 1, 2
      |)
      |SELECT price_c, p_size, n_parts
      |FROM pr p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pr o
      |  WHERE o.price_c <= p.price_c AND o.p_size >= p.p_size
      |    AND (o.price_c < p.price_c OR o.p_size > p.p_size))
      |ORDER BY price_c""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline"         -> (qSkyline _),
    "q_order_gaps"      -> (qOrderGaps _),
    "q_repeat_customers" -> (qRepeatCustomers _),
    "q_priority_mix"    -> (qPriorityMix _),
    "q_yearly_growth"   -> (qYearlyGrowth _),
    "q_revenue_deciles" -> (qRevenueDeciles _),
    "q_basket_pairs"    -> (qBasketPairs _),
    "q_nation_volume"   -> (qNationVolume _),
    "q_correlated_agg"  -> (qCorrelatedAgg _),
    "q_anti_agg"        -> (qAntiAgg _),
    "q_promo_share"     -> (qPromoShare _),
    "q_top_supplier"    -> (qTopSupplier _),
    "q_disjunct_filter" -> (qDisjunctFilter _),
    "q_big_orders"      -> (qBigOrders _),
    "q_supplier_variety" -> (qSupplierVariety _),
    "q_sole_blame"      -> (qSoleBlame _),
    "q_market_share"    -> (qMarketShare _),
    "q_returned_items"  -> (qReturnedItems _))

  val oracle: Map[String, String] = Map(
    "q_skyline"         -> qSkylineSql,
    "q_order_gaps"      -> qOrderGapsSql,
    "q_repeat_customers" -> qRepeatCustomersSql,
    "q_priority_mix"    -> qPriorityMixSql,
    "q_yearly_growth"   -> qYearlyGrowthSql,
    "q_revenue_deciles" -> qRevenueDecilesSql,
    "q_basket_pairs"    -> qBasketPairsSql,
    "q_nation_volume"   -> qNationVolumeSql,
    "q_correlated_agg"  -> qCorrelatedAggSql,
    "q_anti_agg"        -> qAntiAggSql,
    "q_promo_share"     -> qPromoShareSql,
    "q_top_supplier"    -> qTopSupplierSql,
    "q_disjunct_filter" -> qDisjunctFilterSql,
    "q_big_orders"      -> qBigOrdersSql,
    "q_supplier_variety" -> qSupplierVarietySql,
    "q_sole_blame"      -> qSoleBlameSql,
    "q_market_share"    -> qMarketShareSql,
    "q_returned_items"  -> qReturnedItemsSql)
}
