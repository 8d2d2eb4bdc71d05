package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable distinct-count sketches (Flajolet et al., AofA 2007 —
  * HyperLogLog) in ENGINE-EXACT integer arithmetic: the one aggregate a
  * 100 TB pipeline cannot run exactly (distinct tokens/users per slice
  * needs a corpus-sized shuffle per query) becomes 64 small integers per
  * slice that merge by element-wise MAX — shards sketch independently,
  * partial aggregation is the merge, and historical sketches fold with
  * new ones without re-reading anything.
  *
  * Everything the gate emits is exact BIGINT algebra both engines
  * replay bit-for-bit (unlike `q_percentiles_approx`'s rows-only
  * sketches): the token hash is graft's portable char-polynomial
  * (native `char_poly_hash` ↔ DuckDB list_reduce), bucket = h mod 64,
  * rank ρ = 1 + trailing-zeros(h div 64) expressed as Σ [v mod 2^k = 0]
  * (v = 0 saturates to the cap automatically), the register sum rides
  * the dyadic scaling S = Σ 2^(cap − M_b) as a plain integer, and the
  * raw HLL estimate α·m²/Σ2^(−M) becomes the exact integer division
  * (709·m²·2^cap) DIV (1000·S). The bias-corrected small/large-range
  * forms need ln(), which is NOT cross-engine-reproducible — the gate
  * ships the raw statistics (v_zero makes the linear-counting
  * correction a consumer-side one-liner), and the spec applies the
  * correction driver-side to pin accuracy against the exact count. */
object Sketches {

  /** Register count (m = 2^6). */
  val M = 64
  /** Rank cap: h div 64 < p/64 ≈ 2^24, so 20 trailing-zero tests saturate
    * every value; empty/zero registers read cap = 21. */
  val RMax = 21
  private val P = 1000000007L

  private def tokHash(w: Column): Column = mix(call_function("char_poly_hash", w))

  /** Quadratic scramble on top of the polynomial hash: the poly hash is
    * LINEAR in the last characters, so a numbered vocabulary ("w0".."w799")
    * lands on arithmetic progressions whose trailing-zero profile is the
    * ruler sequence — bounded, no geometric tail, and HLL's estimator
    * reads ~half the true cardinality (measured). Squaring mod p breaks
    * the linearity (h < p ≈ 2³⁰ so h² < 2⁶⁰ — exact BIGINT in both
    * engines); the +h term keeps the map injective-ish in practice and
    * the spec pins estimator accuracy across cardinality regimes. */
  private def mix(h: Column): Column =
    pmod(pmod(h * h, lit(P)) * lit(31L) + h, lit(P))

  private def mixSql(h: String): String =
    s"((($h) * ($h)) % $P * 31 + ($h)) % $P"

  /** Scrambled portable id hash / rank, shared with the streaming twin
    * ([[graft.streaming.StreamIngest.registerSketchStream]]). */
  private[graft] def mixedIdHash(id: Column): Column = mix(TextAnalysis.idHash(id))
  private[graft] def rhoCol(v: Column): Column = rho(v)

  /** The raw-estimate arithmetic as ONE shared pair of constants — every
    * consumer (three oracles, both engine sides) composes THESE, so an
    * α/m/cap retune cannot silently leave a copy stale (the r8 advisory's
    * regex-surgery lesson applied preemptively). */
  private val EstNum = 709L * M * M * (1L << RMax)
  private def rawEstCol(sCol: String): Column =
    expr(s"${EstNum}L DIV (1000 * $sCol)")
  private def rawEstSql(sRef: String): String =
    s"CAST($EstNum // (1000 * ($sRef)) AS BIGINT)"
  private def sScaledCol(reg: String): Column =
    sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($RMax - $reg AS INT))"))
  private def sScaledSql(reg: String): String =
    s"CAST(sum(1::BIGINT << ($RMax - $reg)) AS BIGINT)"

  /** ρ(v) = 1 + Σ_{k=1..20} [v mod 2^k = 0] — trailing-zero rank with the
    * v = 0 case saturating to [[RMax]] with no special-casing. */
  private def rho(v: Column): Column =
    lit(1L) + (1 until RMax).map(k =>
      when(pmod(v, lit(1L << k)) === 0L, 1L).otherwise(0L)).reduce(_ + _)

  private def rhoSql(v: String): String =
    "1 + " + (1 until RMax).map(k =>
      s"(CASE WHEN ($v) % ${1L << k} = 0 THEN 1 ELSE 0 END)").mkString(" + ")

  /** Per-group (`keys`) HLL registers over a token column: one row per
    * (keys, bucket) with the max rank. Exposed at register grain so
    * consumers can MERGE sketches (element-wise max) before estimating. */
  def registersOf(df: DataFrame, keys: Seq[String], tok: Column): DataFrame = {
    val h = tokHash(tok)
    // h ∈ [0, p): bucket = low 6 bits, v = the remaining ~24 — integer
    // ops only (Column `/` is DOUBLE division; shiftright keeps it exact)
    df.select(keys.map(col) :+ pmod(h, lit(M.toLong)).as("bucket")
        :+ rho(shiftright(h, 6)).as("rho"): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m_reg"))
  }

  /** Gate: per-language distinct-token sketch over `documents` — built at
    * (lang, SOURCE) grain first and max-MERGED to lang (the property that
    * makes the sketch an artifact: per-shard/per-day sketches fold), then
    * densified over all 64 buckets and reduced to the exact-integer
    * summary plus the exact distinct count for comparison (gate-scale
    * only; at 100 TB the exact column is precisely what you no longer
    * compute). */
  def corpusDistinctSketch(spark: SparkSession, dir: String): DataFrame =
    corpusDistinctSketchOf(Tables.documents(spark, dir))

  def corpusDistinctSketchOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("lang"), col("source"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
    // per-(lang, source) sketches, merged to lang by element-wise max —
    // the merge IS an aggregate, so it rides one exchange
    val perSource = registersOf(toks, Seq("lang", "source"), col("w"))
    val merged = perSource.groupBy(col("lang"), col("bucket"))
      .agg(max(col("m_reg")).as("m_reg"))
    // densify: empty buckets are REAL zeros in the estimator
    val langs = docs.select(col("lang")).distinct()
    val grid = langs.select(col("lang"),
      explode(sequence(lit(0L), lit(M - 1L))).as("bucket"))
    val dense = grid.join(merged, Seq("lang", "bucket"), "left")
      .select(col("lang"), col("bucket"),
        coalesce(col("m_reg"), lit(0L)).as("m_reg"))
    val summary = dense.groupBy(col("lang"))
      .agg(sum(when(col("m_reg") === 0L, 1L).otherwise(0L)).as("v_zero"),
        // dyadic scaling as a SHIFT — pow() is not cross-engine territory
        sScaledCol("m_reg").as("s_scaled"))
      .withColumn("est_raw", rawEstCol("s_scaled"))
    val exact = toks.groupBy(col("lang"))
      .agg(countDistinct(col("w")).as("n_exact"))
    summary.join(exact, Seq("lang"), "left")
      .select(col("lang"), lit(M.toLong).as("m"), col("v_zero"),
        col("s_scaled"), col("est_raw"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .orderBy(col("lang"))
  }

  private val tokHashSqlW: String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(string_split_regex(w, ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc*31 + x) % $P)"

  val corpusDistinctSketchSql: String =
    s"""WITH tok AS (
       |  SELECT lang, source,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |  FROM documents
       |), h0 AS (
       |  SELECT lang, source, $tokHashSqlW AS hp FROM tok
       |), h AS (
       |  SELECT lang, source, ${mixSql("hp")} AS hv FROM h0
       |), regs AS (
       |  SELECT lang, source, hv % $M AS bucket,
       |    CAST(max(${rhoSql(s"hv // $M")}) AS BIGINT) AS m_reg
       |  FROM h GROUP BY 1, 2, 3
       |), merged AS (
       |  SELECT lang, bucket, max(m_reg) AS m_reg FROM regs GROUP BY 1, 2
       |), grid AS (
       |  SELECT l.lang, g.bucket
       |  FROM (SELECT DISTINCT lang FROM documents) l,
       |       (SELECT unnest(range(0, $M)) AS bucket) g
       |), dense AS (
       |  SELECT grid.lang, grid.bucket, coalesce(m.m_reg, 0) AS m_reg
       |  FROM grid LEFT JOIN merged m
       |    ON grid.lang = m.lang AND grid.bucket = m.bucket
       |), summary AS (
       |  SELECT lang,
       |    CAST(sum(CASE WHEN m_reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
       |    ${sScaledSql("m_reg")} AS s_scaled
       |  FROM dense GROUP BY 1
       |), exact AS (
       |  SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS n_exact FROM tok GROUP BY 1
       |)
       |SELECT s.lang, CAST($M AS BIGINT) AS m, s.v_zero, s.s_scaled,
       |  ${rawEstSql("s.s_scaled")} AS est_raw,
       |  coalesce(e.n_exact, 0) AS n_exact
       |FROM summary s LEFT JOIN exact e ON s.lang = e.lang
       |ORDER BY s.lang""".stripMargin

  /** Gate: trailing-7-day distinct users (WAU) BY SKETCH MERGE — the
    * demonstration of why the registers are the artifact: count-distinct
    * does NOT decompose over sliding windows (every window re-scans its
    * events; `events_active_users` pays a coverage trick to avoid it),
    * but registers do — per-DAY registers merge into any window by
    * element-wise max, so the whole WAU curve is one window-max over a
    * (days × 64)-row grid after one event-grain aggregate. The exact WAU
    * ships beside the estimate for comparison (gate-scale only — at
    * 100 TB the exact column is the thing the sketch replaces). */
  def eventsWauSketch(spark: SparkSession, dir: String): DataFrame =
    eventsWauSketchOf(Tables.events(spark, dir))

  def eventsWauSketchOf(ev: DataFrame): DataFrame = {
    val h = mixedIdHash(col("user_id"))
    val perDay = ev
      .select(floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        pmod(h, lit(M.toLong)).as("bucket"), rho(shiftright(h, 6)).as("rho"))
      .groupBy(col("day"), col("bucket")).agg(max(col("rho")).as("m_reg"))
    // dense (day grid × 64 buckets): a silent day contributes REAL zero
    // registers to every window that covers it
    val span = perDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("day"), explode(sequence(lit(0L), lit(M - 1L))).as("bucket"))
    val dense = grid.join(perDay, Seq("day", "bucket"), "left")
      .select(col("day"), col("bucket"), coalesce(col("m_reg"), lit(0L)).as("m_reg"))
    // the sketch merge: window-max per bucket over the trailing 7 days —
    // calendar × 64 rows, the bounded-grain window class
    val w7 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("day")).rangeBetween(-6, 0)
    val summary = dense.withColumn("m7", max(col("m_reg")).over(w7))
      .groupBy(col("day"))
      .agg(sum(when(col("m7") === 0L, 1L).otherwise(0L)).as("v_zero"),
        sScaledCol("m7").as("s_scaled"))
      .withColumn("est_raw", rawEstCol("s_scaled"))
    // exact trailing distinct for comparison: each (user, day) sighting
    // covers the 7 windows it falls in
    val exact = ev
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .distinct()
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .groupBy(col("wday")).agg(countDistinct(col("user_id")).as("exact_wau"))
    summary.join(exact, summary("day") === exact("wday"), "left")
      .select(col("day"), col("v_zero"), col("s_scaled"), col("est_raw"),
        coalesce(col("exact_wau"), lit(0L)).as("exact_wau"))
      .orderBy(col("day"))
  }

  val eventsWauSketchSql: String =
    s"""WITH pd AS (
       |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       |    ${mixSql(TextAnalysis.idHashSql("user_id"))} AS hv
       |  FROM events
       |), regs AS (
       |  SELECT day, hv % $M AS bucket,
       |    CAST(max(${rhoSql(s"hv // $M")}) AS BIGINT) AS m_reg
       |  FROM pd GROUP BY 1, 2
       |), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM regs
       |), grid AS (
       |  SELECT d.day, b.bucket
       |  FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM span) d,
       |       (SELECT unnest(range(0, $M)) AS bucket) b
       |), dense AS (
       |  SELECT grid.day, grid.bucket, coalesce(r.m_reg, 0) AS m_reg
       |  FROM grid LEFT JOIN regs r ON grid.day = r.day AND grid.bucket = r.bucket
       |), w AS (
       |  SELECT day, bucket,
       |    max(m_reg) OVER (PARTITION BY bucket ORDER BY day
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS m7
       |  FROM dense
       |), summary AS (
       |  SELECT day,
       |    CAST(sum(CASE WHEN m7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
       |    ${sScaledSql("m7")} AS s_scaled
       |  FROM w GROUP BY 1
       |), ud AS (
       |  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
       |  FROM events
       |), exact AS (
       |  SELECT t.wday, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau
       |  FROM ud, unnest(range(ud.day, ud.day + 7)) AS t(wday)
       |  GROUP BY 1
       |)
       |SELECT s.day, s.v_zero, s.s_scaled,
       |  ${rawEstSql("s.s_scaled")} AS est_raw,
       |  coalesce(e.exact_wau, 0) AS exact_wau
       |FROM summary s LEFT JOIN exact e ON s.day = e.wday
       |ORDER BY s.day""".stripMargin

  /** Gate: pairwise SOURCE vocabulary overlap by sketch set-algebra —
    * the cross-corpus contamination/similarity estimator that runs
    * without ever joining token sets: |A∩B| ≈ est(A) + est(B) −
    * est(A∪B), where est(A∪B) comes from max-merging the two sources'
    * registers (unions are exact on registers; only the cardinality
    * estimate is approximate). Per-source registers build once and
    * every pair is 64-row arithmetic — S sources cost S sketches +
    * S²/2 tiny merges, never S²/2 token-set joins. Estimates are the
    * raw integer form (the [[corpusDistinctSketch]] contract); the
    * exact overlap ships beside them at gate scale. Inclusion-exclusion
    * can go negative on near-disjoint sets — clamped at 0, the standard
    * reading — and compounds three ±1.04/√m estimators, so at m = 64 it
    * resolves DOMINANT overlaps (mirrored dumps, syndicated feeds), not
    * slivers; the spec pins exactly that contract. Production tuning is
    * one knob (m), at 8 bytes a register. */
  def corpusSourceOverlap(spark: SparkSession, dir: String): DataFrame =
    corpusSourceOverlapOf(Tables.documents(spark, dir))

  def corpusSourceOverlapOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
    val regs = registersOf(toks, Seq("source"), col("w")).localCheckpoint()
    // densify per source over all 64 buckets
    val grid = docs.select(col("source")).distinct()
      .select(col("source"), explode(sequence(lit(0L), lit(M - 1L))).as("bucket"))
    val dense = grid.join(regs, Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        coalesce(col("m_reg"), lit(0L)).as("m_reg"))
      .localCheckpoint()
    def estOf(grouped: org.apache.spark.sql.RelationalGroupedDataset,
              keys: Seq[String], out: String): DataFrame =
      grouped
        .agg(sScaledCol("m_reg").as("s"))
        .select(keys.map(col) :+ rawEstCol("s").as(out): _*)
    val single = estOf(dense.groupBy(col("source")), Seq("source"), "est")
    // every unordered pair: registers of the union = element-wise max
    val a = dense.select(col("source").as("src_a"), col("bucket"), col("m_reg").as("ra"))
    val b = dense.select(col("source").as("src_b"), col("bucket"), col("m_reg").as("rb"))
    val unionRegs = a.join(b, Seq("bucket")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("bucket"),
        greatest(col("ra"), col("rb")).as("m_reg"))
    val unionEst = estOf(unionRegs.groupBy(col("src_a"), col("src_b")),
      Seq("src_a", "src_b"), "est_union")
    // exact overlap at gate scale: distinct tokens present in both
    val tset = toks.distinct()
    val exact = tset.select(col("source").as("src_a"), col("w"))
      .join(tset.select(col("source").as("src_b"), col("w")), Seq("w"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(countDistinct(col("w")).as("exact_overlap"))
    unionEst
      .join(single.select(col("source").as("src_a"), col("est").as("est_a")), "src_a")
      .join(single.select(col("source").as("src_b"), col("est").as("est_b")), "src_b")
      .join(exact, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val corpusSourceOverlapSql: String = {
    s"""WITH tok AS (
       |  SELECT source,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |  FROM documents
       |), h AS (
       |  SELECT source, ${mixSql(tokHashSqlW)} AS hv FROM tok
       |), regs AS (
       |  SELECT source, hv % $M AS bucket,
       |    CAST(max(${rhoSql(s"hv // $M")}) AS BIGINT) AS m_reg
       |  FROM h GROUP BY 1, 2
       |), grid AS (
       |  SELECT s.source, g.bucket
       |  FROM (SELECT DISTINCT source FROM documents) s,
       |       (SELECT unnest(range(0, $M)) AS bucket) g
       |), dense AS MATERIALIZED (
       |  SELECT grid.source, grid.bucket, coalesce(r.m_reg, 0) AS m_reg
       |  FROM grid LEFT JOIN regs r
       |    ON grid.source = r.source AND grid.bucket = r.bucket
       |), single AS (
       |  SELECT source,
       |    ${rawEstSql(s"sum(1::BIGINT << ($RMax - m_reg))")} AS est
       |  FROM dense GROUP BY 1
       |), uni AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    ${rawEstSql(s"sum(1::BIGINT << ($RMax - greatest(a.m_reg, b.m_reg)))")}
       |      AS est_union
       |  FROM dense a JOIN dense b
       |    ON a.bucket = b.bucket AND a.source < b.source
       |  GROUP BY 1, 2
       |), tset AS (SELECT DISTINCT source, w FROM tok
       |), exact AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    CAST(count(DISTINCT a.w) AS BIGINT) AS exact_overlap
       |  FROM tset a JOIN tset b ON a.w = b.w AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT u.src_a, u.src_b, sa.est AS est_a, sb.est AS est_b, u.est_union,
       |  greatest(sa.est + sb.est - u.est_union, 0) AS est_overlap,
       |  coalesce(e.exact_overlap, 0) AS exact_overlap
       |FROM uni u
       |JOIN single sa ON u.src_a = sa.source
       |JOIN single sb ON u.src_b = sb.source
       |LEFT JOIN exact e ON u.src_a = e.src_a AND u.src_b = e.src_b
       |ORDER BY u.src_a, u.src_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_distinct_sketch" -> (corpusDistinctSketch _),
    "corpus_source_overlap"  -> (corpusSourceOverlap _),
    "events_wau_sketch"      -> (eventsWauSketch _))

  val oracle: Map[String, String] = Map(
    "corpus_distinct_sketch" -> corpusDistinctSketchSql,
    "corpus_source_overlap"  -> corpusSourceOverlapSql,
    "events_wau_sketch"      -> eventsWauSketchSql)
}
