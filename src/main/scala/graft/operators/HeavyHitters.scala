package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact heavy hitters by two-phase candidate pruning (Misra & Gries,
  * Sci. Comp. Prog. 1982; the distributed two-round form of
  * Agarwal et al., "Mergeable Summaries", PODS'12 §5).
  *
  * The 100 TB problem: "every token with ≥ 1/k of all occurrences" over a
  * domain too large to aggregate (n-grams, URLs, (user, item) pairs —
  * token-type grain can approach token-OCCURRENCE grain). The fix is that
  * heavy hitters are LOCALLY heavy somewhere: if n(g)·k ≥ N globally,
  * then by averaging some partition has n_p(g)·k ≥ N_p. So:
  *
  *  - Phase 1 (candidates, ZERO shuffle): each partition streams its
  *    tokens through a k-counter Misra-Gries summary — bounded memory,
  *    one pass — and emits only its surviving keys. MG guarantees every
  *    item with local count > N_p/(k+1) keeps a counter, which covers
  *    every n_p ≥ N_p/k ≥ 1 item; only ≤ k candidates per partition ever
  *    cross the wire, not the domain.
  *  - Phase 2 (exact recount): the candidate set is bounded by
  *    partitions·k BY CONSTRUCTION, so it broadcasts; the token stream
  *    semi-joins against it and only candidate tokens aggregate. The
  *    global threshold n·k ≥ N then makes the OUTPUT exact — the set of
  *    true heavy hitters with exact counts, independent of partitioning
  *    (approximation lives only in the pruning, never in the answer).
  *
  * The gate runs the word domain (k = 1000 — the stopword/boilerplate
  * census; words are Zipf-distributed in the corpus so the set is stable
  * across scale factors); the gram-domain form and the adversarial
  * spread/local-spike geometries are spec-proven. The DuckDB oracle
  * computes the single-pass global answer — hash equality proves the
  * pruning lemma lost nothing. */
object HeavyHitters {

  /** Share denominator: a heavy hitter holds ≥ 1/K of all occurrences. */
  val K = 1000

  /** Phase-1 Misra-Gries candidate keys, ≤ k per input partition.
    * Classic decrement form: a full summary meeting a new key decrements
    * every counter and drops zeros — each such event retires k+1
    * occurrences, so total work is O(N) and memory is k counters. */
  private[graft] def mgCandidates(toks: Dataset[String], k: Int): DataFrame = {
    import toks.sparkSession.implicits._
    toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { g =>
        if (counters.contains(g)) counters(g) += 1L
        else if (counters.size < k) counters(g) = 1L
        else {
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (key, v) => if (v == 0L) dead += key }
          dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("gram").distinct()
  }

  /** Exact heavy hitters of a one-column ("gram") token stream: every
    * gram with n·k ≥ N, with exact counts and share in basis points. */
  private[graft] def heavyHittersOf(toks: DataFrame, k: Int): DataFrame = {
    import toks.sparkSession.implicits._
    val cands = mgCandidates(toks.select(col("gram")).as[String], k)
    val total = toks.agg(count(lit(1)).as("n_total"))
    // candidates are ≤ partitions·k by construction — always broadcast
    toks.join(broadcast(cands), "gram")
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k >= col("n_total"))
      .select(col("gram"), col("n"),
        expr("n * 10000 DIV n_total").as("share_bp"))
      .orderBy(col("n").desc, col("gram"))
  }

  /** Gate: word-domain heavy hitters over `documents` at k = [[K]]. */
  def corpusHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    corpusHeavyHittersOf(Tables.documents(spark, dir))

  def corpusHeavyHittersOf(docs: DataFrame): DataFrame =
    heavyHittersOf(
      docs.select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("gram")),
      K)

  val corpusHeavyHittersSql: String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS gram
       |  FROM documents
       |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok
       |), cnt AS (
       |  SELECT gram, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
       |)
       |SELECT c.gram, c.n, CAST(c.n * 10000 // t.n_total AS BIGINT) AS share_bp
       |FROM cnt c, t
       |WHERE c.n * $K >= t.n_total
       |ORDER BY c.n DESC, c.gram""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_heavy_hitters" -> (corpusHeavyHitters _))

  val oracle: Map[String, String] = Map(
    "corpus_heavy_hitters" -> corpusHeavyHittersSql)
}
