package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-level statistical signals beyond [[TextAnalysis]]: character
  * entropy, TF-IDF term salience, PMI collocations and winnowing
  * fingerprints. All ln-based gate columns follow the repo's e4 discipline
  * — round each ln to integral 1e-4 units BEFORE any sum (integer sums are
  * order-independent), with LogGateMarginSpec pinning a ≥1e-6 margin from
  * every .5 rounding boundary the gate corpora actually evaluate. */
object CorpusStats {

  private val word = "[a-z0-9]+"

  /** Per-doc character-level Shannon entropy over [a-z0-9] characters —
    * the cheap gibberish/compressibility signal (base64 blobs and
    * keyboard-mash score far from prose). Gate columns are exact integers:
    * entropy_num_e4 = Σ_c cnt_c · round(ln(n/cnt_c)·1e4), so per-char
    * entropy = entropy_num_e4 / n_alnum / 1e4.
    *
    * Plan shape: explode chars → groupBy(doc, char) with map-side combine
    * (the heavy exchange moves ~36 rows per doc, not one per char), then
    * the per-doc total as a window over the SAME aggregate — deliberately
    * NOT a pre-shuffle repartition(doc_id): that would satisfy both keys
    * with one exchange but ship every raw char row through it, trading a
    * ~n_chars/36-fold combine for one saved exchange of tiny count rows. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    textEntropyOf(Tables.documents(spark, dir))

  def textEntropyOf(docs: DataFrame): DataFrame = {
    val cnts = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]"), lit(0))).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("doc_id"))
    cnts.withColumn("n", sum(col("cnt")).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("cnt")).as("n_alnum"),
        sum(col("cnt") *
          round(log(col("n").cast("double") / col("cnt")) * 10000).cast("long"))
          .as("entropy_num_e4"))
      .orderBy(col("doc_id"))
  }

  val textEntropySql: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS c
      |  FROM documents
      |), cnts AS (
      |  SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM cnts GROUP BY 1
      |)
      |SELECT doc_id, count(*) AS n_distinct, CAST(sum(cnt) AS BIGINT) AS n_alnum,
      |  CAST(sum(cnt * CAST(round(ln(n::DOUBLE / cnt) * 10000, 0) AS BIGINT)) AS BIGINT)
      |    AS entropy_num_e4
      |FROM cnts JOIN tot USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-5 TF-IDF terms per document — the classic term-salience /
    * keyword-extraction signal. score_e4 = tf · round(ln(N/df)·1e4) is
    * exact integer math once the idf is e4-rounded (margin-pinned);
    * ties break on the term itself, so the top-5 is total-ordered.
    *
    * Plan shape: tf = groupBy(doc, term) with map-side combine; df is a
    * partial aggregate OF tf (never a second corpus scan); N is a
    * single-row count broadcast under the scored rows. The tf ⋈ df join is
    * vocabulary-sized on the right — broadcast-able while the vocab fits,
    * and Catalyst demotes to shuffle when it does not. The final top-5 is
    * a row_number over doc_id partitions of the already-aggregated tf
    * relation (≪ token stream). */
  def corpusTfidfTopk(spark: SparkSession, dir: String): DataFrame =
    corpusTfidfTopkOf(Tables.documents(spark, dir))

  def corpusTfidfTopkOf(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfr, "w").crossJoin(broadcast(nDocs))
      .withColumn("idf_e4",
        round(log(col("n_docs").cast("double") / col("df")) * 10000).cast("long"))
      .withColumn("score_e4", col("tf") * col("idf_e4"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e4").desc, col("w"))
    scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("rn").cast("long").as("rn"), col("w"),
        col("tf"), col("df"), col("score_e4"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val corpusTfidfTopkSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT w, count(*) AS df FROM tf GROUP BY 1
      |), nd AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, rn, w, tf, df, score_e4 FROM (
      |  SELECT doc_id, w, tf, df,
      |    tf * CAST(round(ln(n_docs::DOUBLE / df) * 10000, 0) AS BIGINT) AS score_e4,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf * CAST(round(ln(n_docs::DOUBLE / df) * 10000, 0) AS BIGINT) DESC, w) AS rn
      |  FROM tf JOIN df USING (w) CROSS JOIN nd)
      |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin

  /** BM25 retrieval (Robertson & Zaragoza, FnTIR'09; Lucene's +1 idf form
    * so every contribution is positive) — the missing RETRIEVAL primitive
    * beside [[corpusTfidfTopk]]'s per-doc keyword report: score the corpus
    * against a query and return the top-N documents, i.e. the op behind
    * every "search your training data" / RAG-retrieval / contamination-
    * triage workflow. Fixed gate query [[Bm25Query]]; the production form
    * takes any term list.
    *
    * Cross-engine exactness: per-(doc, term) contributions are rounded to
    * e4 BIGINTs and summed as integers (the unigram-logprob ln
    * discipline; LogGateMarginSpec pins every gate-corpus contribution
    * ≥1e-6 from a .5 boundary), and the RANKING runs over the rounded
    * integer scores — both engines order identically by construction.
    * The double arithmetic is written as the TEXTUALLY identical
    * expression in both engines (same IEEE tree, ln the only
    * transcendental).
    *
    * Plan shape: one tokenize pass feeds dl (doc-grain partial aggregate)
    * and the term-filtered tf (the `w IN (...)` predicate prunes at token
    * grain, map-side — the fact-sized work is ONE scan); df/n/tot are
    * tiny broadcasts; the top-N is orderBy+limit = TakeOrderedAndProject
    * (per-partition heaps + driver merge, never a global sort); the rank
    * window runs over the ≤topN collected rows (bounded by construction). */
  def corpusBm25(spark: SparkSession, dir: String): DataFrame =
    corpusBm25Of(Tables.documents(spark, dir), Bm25Query, 20)

  val Bm25Query: Seq[String] = Seq("fast", "vector", "join")

  def corpusBm25Of(docs: DataFrame, terms: Seq[String], topN: Int): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("w"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val totToks = tok.agg(count(lit(1)).as("tot_toks"))
    val tf = tok.filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfr), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(totToks))
      // textually identical to the oracle's expression — see Scaladoc
      .withColumn("c_e4", expr(
        "CAST(round(ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0) * (tf * 2.2e0)" +
        " / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (dl * n_docs / tot_toks)))" +
        " * 10000, 0) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c_e4")).as("score_e4"))
      .orderBy(col("score_e4").desc, col("doc_id"))
      .limit(topN)
    // rank window over ≤topN rows — bounded by the limit above
    val wR = Window.orderBy(col("score_e4").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(wR).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_terms_hit"), col("score_e4"))
      .orderBy(col("rank"))
  }

  val corpusBm25Sql: String = {
    val inList = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
      |), nd AS (SELECT count(*) AS n_docs FROM documents
      |), tt AS (SELECT count(*) AS tot_toks FROM tok
      |), tf AS (
      |  SELECT doc_id, w, count(*) AS tf FROM tok
      |  WHERE w IN ($inList) GROUP BY 1, 2
      |), dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY 1
      |), sc AS (
      |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
      |    CAST(sum(CAST(round(ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0) * (tf * 2.2e0) / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * (dl * n_docs / tot_toks))) * 10000, 0) AS BIGINT)) AS BIGINT) AS score_e4
      |  FROM tf t JOIN dl d USING (doc_id) JOIN dfr USING (w)
      |  CROSS JOIN nd CROSS JOIN tt
      |  GROUP BY 1
      |)
      |SELECT * FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS BIGINT)
      |      AS rank,
      |    doc_id, n_terms_hit, score_e4
      |  FROM sc)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin
  }

  /** Top-20 corpus collocations by pointwise mutual information over
    * adjacent word pairs (c12 ≥ 3): pmi = ln(c12·N / (c1·c2)) with all
    * four counts taken from the bigram table itself (c1/c2 = left/right
    * marginals), so the ln argument is an exact rational of BIGINTs and
    * the double products (< 2^53 at gate scale) evaluate identically in
    * both engines. Every c12 ≥ 3 row's pmi is margin-pinned — a rounding
    * flip anywhere in the filtered set could reorder the top-20 boundary,
    * not just the 20 output rows.
    *
    * Plan shape: ONE bigram count aggregate, pinned (localCheckpoint) —
    * the marginals and the total are partial aggregates OF it, never a
    * token-stream rescan; the marginal joins are vocabulary-sized. The
    * top-20 rides TakeOrdered (per-partition heap + driver merge), never
    * a global sort. */
  def corpusPmiTopk(spark: SparkSession, dir: String): DataFrame =
    corpusPmiTopkOf(Tables.documents(spark, dir))

  def corpusPmiTopkOf(docs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = docs
      .select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")), lit(word), lit(0)))
          .as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(wOrd))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val left  = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val right = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val tot   = c12.agg(sum(col("c12")).as("n_bg"))
    c12.filter(col("c12") >= 3)
      .join(left, "w1").join(right, "w2").crossJoin(broadcast(tot))
      .withColumn("pmi_e4",
        round(log((col("c12").cast("double") * col("n_bg")) /
          (col("c1").cast("double") * col("c2"))) * 10000).cast("long"))
      .select(col("w1"), col("w2"), col("c12"), col("pmi_e4"))
      .orderBy(col("pmi_e4").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val corpusPmiTopkSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
      |), bg AS (
      |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS b
      |  FROM tok WHERE len(ws) >= 2
      |), c12 AS (
      |  SELECT b, count(*) AS c12 FROM bg GROUP BY 1
      |), sp AS (
      |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2, c12 FROM c12
      |), l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM sp GROUP BY 1),
      |r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM sp GROUP BY 1),
      |tot AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bg FROM c12)
      |SELECT w1, w2, c12,
      |  CAST(round(ln((c12::DOUBLE * n_bg) / (c1::DOUBLE * c2)) * 10000, 0) AS BIGINT)
      |    AS pmi_e4
      |FROM sp JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
      |WHERE c12 >= 3
      |ORDER BY pmi_e4 DESC, w1, w2 LIMIT 20""".stripMargin

  /** Winnowing fingerprints per document (the MOSS scheme, Schleimer et
    * al. SIGMOD'03): hash every word 5-gram, slide a 4-gram window, keep
    * each window's minimum hash, dedupe — guaranteeing any shared run of
    * ≥ 8 words contributes a shared fingerprint while storing ~2/(w+1) of
    * the grams. The gram hash is md5 over the space-joined words (the
    * cross-engine hash [[TextAnalysis.corpusDedupSpansOf]] established);
    * min over fixed-width lowercase hex = numeric min, engine-exact.
    *
    * Plan shape: everything — gram build (lead), window min, full-window
    * guard, distinct, per-doc aggregate — partitions by doc_id, so the
    * exploded token stream is exchanged ONCE and every later step reuses
    * the sort order the first window imposed. Output is one row per doc
    * (n_fp + order-canonical set hash), never the fingerprint set itself. */
  def textWinnow(spark: SparkSession, dir: String): DataFrame =
    textWinnowOf(Tables.documents(spark, dir))

  def textWinnowOf(docs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = docs.select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")), lit(word), lit(0)))
        .as(Seq("pos", "w")))
    val gramParts = col("w") +: (1 until 5).map(i => lead(col("w"), i).over(wOrd))
    val grams = tok.withColumn("gram",
        when(lead(col("w"), 4).over(wOrd).isNotNull,
          md5(concat_ws(" ", gramParts: _*).cast("binary"))))
      .filter(col("gram").isNotNull)
    val sel = grams
      .withColumn("fp", min(col("gram")).over(wOrd.rowsBetween(0, 3)))
      .withColumn("g3", lead(col("gram"), 3).over(wOrd))
      .filter(col("g3").isNotNull)
      .select(col("doc_id"), col("fp")).distinct()
    val agg = sel.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        md5(concat_ws(" ", array_sort(collect_list(col("fp")))).cast("binary"))
          .as("fp_set_hash"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("fp_set_hash"), md5(lit("").cast("binary"))).as("fp_set_hash"))
      .orderBy(col("doc_id"))
  }

  val textWinnowSql: String = {
    val leads = (1 to 4).map(i => s"lead(w, $i) OVER wd").mkString(", ")
    s"""WITH tk AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(ws) AS w, unnest(range(0, len(ws))) AS pos FROM tk
      |), gram AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lead(w, 4) OVER wd IS NOT NULL
      |         THEN md5(concat_ws(' ', w, $leads)) END AS gram
      |  FROM tok WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
      |), g AS (
      |  SELECT doc_id, pos, gram FROM gram WHERE gram IS NOT NULL
      |), sel AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id,
      |      min(gram) OVER (PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
      |      lead(gram, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS g3
      |    FROM g) WHERE g3 IS NOT NULL
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_fp,
      |    md5(string_agg(fp, ' ' ORDER BY fp)) AS fp_set_hash
      |  FROM sel GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp,
      |  coalesce(a.fp_set_hash, md5('')) AS fp_set_hash
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  }

  /** Per-document memorization-risk report (Lee et al. ACL'22, "Deduplicating
    * Training Data Makes Language Models Better" §5: duplicated substrings
    * are what models memorize): for every doc, how many of its distinct
    * word trigram shingles also occur in at least one OTHER document, and
    * that count in basis points of the doc's shingle set. High dup_bp with
    * no near-dup pair is exactly the boilerplate/template class — risky to
    * memorize, invisible to whole-doc dedup. Same trigram universe as
    * [[Dedup.dedupNgram]], so a flagged doc can be traced to its pairs.
    *
    * Plan shape: distinct (doc, gram) once, then the cross-corpus
    * occurrence count as a WINDOW over the gram partitions — one gram-keyed
    * exchange that a groupBy+join-back formulation would pay twice (and
    * rebuild the tokenize subtree for). Count rows per gram = docs
    * containing it, since (doc, gram) is distinct. The per-doc rollup is
    * the only other exchange. Hot grams skew the gram partitions, but a
    * count-only window is a streaming aggregate over each key — no
    * materialized pair fan-out (this is the df-side of dedup_ngram WITHOUT
    * its self-join, which is why no df cap is needed). */
  def textMemorization(spark: SparkSession, dir: String): DataFrame =
    textMemorizationOf(Tables.documents(spark, dir))

  def textMemorizationOf(docs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tri = docs
      .select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")), lit(word), lit(0)))
          .as(Seq("pos", "w")))
      .withColumn("gram",
        when(lead(col("w"), 2).over(wOrd).isNotNull,
          concat_ws(" ", col("w"), lead(col("w"), 1).over(wOrd),
            lead(col("w"), 2).over(wOrd))))
      .filter(col("gram").isNotNull)
      .select(col("doc_id"), col("gram")).distinct()
    val agg = tri
      .withColumn("docs_with", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("dup_shingles"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("dup_shingles"), lit(0L)).as("dup_shingles"))
      .withColumn("dup_bp",
        when(col("n_shingles") > 0,
          expr("dup_shingles * 10000 DIV n_shingles")).otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  val textMemorizationSql: String =
    """WITH tk AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
      |), tri AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(ws) - 1),
      |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
      |  FROM tk WHERE len(ws) >= 3
      |), cnt AS (
      |  SELECT doc_id, count(*) OVER (PARTITION BY gram) AS docs_with FROM tri
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_shingles,
      |    CAST(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS dup_shingles
      |  FROM cnt GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(a.n_shingles, 0) AS n_shingles,
      |  coalesce(a.dup_shingles, 0) AS dup_shingles,
      |  CAST(CASE WHEN coalesce(a.n_shingles, 0) > 0
      |    THEN a.dup_shingles * 10000 // a.n_shingles ELSE 0 END AS BIGINT)
      |    AS dup_bp
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek et al. LREC'20): split each
    * language's documents into head / middle / tail terciles by LM score —
    * the standard quality-stratified curation cut (train on head+middle,
    * hold tail for filtering). The score is the per-token unigram logprob
    * in e4 units ([[TextAnalysis.textUnigramLogprob]]'s sum, integer-
    * divided by the token count), higher = more fluent = head.
    *
    * Tercile boundaries are HISTOGRAM-GRAIN, deliberately: a per-doc
    * row_number per language is a single-partition-per-language window —
    * the formulation that dies when one language is most of a 100 TB
    * corpus. Instead docs aggregate to their integer score value (bin
    * cardinality is bounded by the e4 VALUE RANGE, not the corpus), the
    * cumulative count runs over those bins, and a bin's bucket is decided
    * by the tercile of its FIRST doc — whole bins share a bucket, ties
    * share fate, and both engines replay the same rule exactly. */
  def corpusPplBucket(spark: SparkSession, dir: String): DataFrame =
    corpusPplBucketOf(Tables.documents(spark, dir))

  def corpusPplBucketOf(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("w"))
    val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).cast("double").as("total"))
    val scored = tok.join(freq, "w")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(round(log(col("cnt") / col("total")) * 10000).cast("long"))
          .as("sum_lp_e4"))
      .withColumn("avg_lp_e4", expr("sum_lp_e4 DIV n_toks"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      // consumed twice (bin histogram + final join-back); pinned so the
      // token-stream scoring join runs once — the artifact is doc-grain
      // scalars (~32 B/doc), not the token stream
      .localCheckpoint()
    val bins = scored.groupBy(col("lang"), col("avg_lp_e4"))
      .agg(count(lit(1)).as("bin_cnt"))
    val wLang = Window.partitionBy(col("lang")).orderBy(col("avg_lp_e4").desc)
    val bucketed = bins
      .withColumn("cum_before",
        coalesce(sum(col("bin_cnt")).over(
          wLang.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_lang", sum(col("bin_cnt")).over(Window.partitionBy(col("lang"))))
      .withColumn("bucket",
        when(expr("cum_before * 3 DIV n_lang") === 0, lit("head"))
          .when(expr("cum_before * 3 DIV n_lang") === 1, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("lang"), col("avg_lp_e4"), col("bucket"))
    scored.select(col("doc_id"), col("lang"), col("avg_lp_e4"))
      .join(broadcast(bucketed), Seq("lang", "avg_lp_e4"))
      .select(col("doc_id"), col("lang"), col("avg_lp_e4"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  val corpusPplBucketSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), freq AS (
      |  SELECT w, count(*) AS cnt FROM tok GROUP BY 1
      |), tot AS (SELECT sum(cnt)::DOUBLE AS total FROM freq),
      |scored AS (
      |  SELECT t.doc_id, d.lang,
      |    CAST(sum(CAST(round(ln(cnt / total) * 10000, 0) AS BIGINT)) AS BIGINT)
      |      // count(*) AS avg_lp_e4
      |  FROM tok t JOIN freq USING (w) CROSS JOIN tot
      |  JOIN documents d ON d.doc_id = t.doc_id
      |  GROUP BY 1, 2
      |), bins AS (
      |  SELECT lang, avg_lp_e4, count(*) AS bin_cnt FROM scored GROUP BY 1, 2
      |), bk AS (
      |  SELECT lang, avg_lp_e4,
      |    CASE (coalesce(sum(bin_cnt) OVER (PARTITION BY lang ORDER BY avg_lp_e4 DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 3)
      |         // (sum(bin_cnt) OVER (PARTITION BY lang))
      |      WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
      |  FROM bins
      |)
      |SELECT s.doc_id, s.lang, CAST(s.avg_lp_e4 AS BIGINT) AS avg_lp_e4, b.bucket
      |FROM scored s JOIN bk b ON s.lang = b.lang AND s.avg_lp_e4 = b.avg_lp_e4
      |ORDER BY s.doc_id""".stripMargin

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A —
    * the published rule set most production pretraining filters start
    * from; distinct from [[TextAnalysis.textQuality]]'s generic ratio
    * score: these are the seven named accept/reject RULES, each emitted
    * as its measured signal so a curator can see WHY a doc fails):
    * word count ∈ [50, 100k]; mean word length ∈ [3, 10]; symbol-to-word
    * ratio (#/ellipsis) ≤ 0.1; ≤ 90% of lines bullet-started; ≤ 30% of
    * lines ellipsis-ended; ≥ 80% of words contain an alphabetic char;
    * ≥ 2 distinct words of the 8-stopword set.
    *
    * Every gate column is an exact integer — counts, and ratios as
    * truncating-DIV basis points (denominators clamped ≥ 1; a 0-word doc
    * reads 0 everywhere and fails the word-count rule) — so the keep bit
    * is engine-exact with no float or margin discipline. Words are
    * whitespace tokens (the [[TextAnalysis.textTokens]] convention);
    * lines split on \n KEEPING trailing empties (Spark needs the
    * explicit limit=-1 — its default split drops them, DuckDB's keeps
    * them, and the line-count denominator must agree).
    *
    * Plan: one narrow (doc_id, text) scan, everything doc-local (the
    * array folds are once-per-row higher-order aggregates, never
    * per-pair), zero shuffles before the gate sort. */
  def corpusGopherFilter(spark: SparkSession, dir: String): DataFrame =
    corpusGopherFilterOf(Tables.documents(spark, dir))

  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def corpusGopherFilterOf(docs: DataFrame): DataFrame = {
    val words   = org.apache.spark.sql.functions.expr("regexp_extract_all(text, '\\\\S+', 0)")
    val lines   = split(col("text"), "\n", -1)
    val nWords  = size(words).cast("long")
    val nLines  = size(lines).cast("long")
    val sumWlen = org.apache.spark.sql.functions.expr(
      "aggregate(regexp_extract_all(text, '\\\\S+', 0), 0L, (a, x) -> a + length(x))")
    val nSym    = size(regexp_extract_all(col("text"), lit("#|\\.\\.\\.|…"), lit(0))).cast("long")
    val nBullet = org.apache.spark.sql.functions.expr(
      "size(filter(split(text, '\\n', -1), x -> x rlike '^\\\\s*[-*•‣▪]'))").cast("long")
    val nEllip  = org.apache.spark.sql.functions.expr(
      "size(filter(split(text, '\\n', -1), x -> x rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$'))").cast("long")
    val nAlpha  = org.apache.spark.sql.functions.expr(
      "size(filter(regexp_extract_all(text, '\\\\S+', 0), x -> x rlike '[A-Za-z]'))").cast("long")
    val nStop   = gopherStops.map(s =>
      when(lower(col("text")).rlike(s"\\b$s\\b"), 1L).otherwise(0L)).reduce(_ + _)
    docs
      .select(col("doc_id"), nWords.as("n_words"), nLines.as("n_lines"),
        sumWlen.cast("long").as("sum_wlen"), nSym.as("n_sym"),
        nBullet.as("n_bullet"), nEllip.as("n_ellipsis"),
        nAlpha.as("n_alpha"), nStop.as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("n_lines"), col("n_stop"),
        expr("sum_wlen * 100 DIV greatest(n_words, 1)").as("mwl_e2"),
        expr("n_sym * 10000 DIV greatest(n_words, 1)").as("sym_bp"),
        expr("n_bullet * 10000 DIV n_lines").as("bullet_bp"),
        expr("n_ellipsis * 10000 DIV n_lines").as("ellipsis_bp"),
        expr("n_alpha * 10000 DIV greatest(n_words, 1)").as("alpha_bp"))
      .withColumn("keep", gopherRules.reduce(_ && _).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** The seven gopher rules as predicates over the bp signal columns —
    * the ONE place the thresholds live on the Spark side: the keep bit
    * is their conjunction, the quality-rank score
    * ([[Dedup.corpusSoftDedupQuality]]) their count. */
  private[operators] def gopherRules: Seq[org.apache.spark.sql.Column] = Seq(
    col("n_words").between(50L, 100000L),
    col("mwl_e2").between(300L, 1000L),
    col("sym_bp") <= 1000L,
    col("bullet_bp") <= 9000L,
    col("ellipsis_bp") <= 3000L,
    col("alpha_bp") >= 8000L,
    col("n_stop") >= 2L)

  /** The gopher signal CTE chain (sig → bp, from `documents`) and the
    * seven-rule keep predicate as composable constants — the datacard and
    * curation-matrix oracles embed THESE instead of regex-stripping the
    * finished query, so a threshold edit propagates to every consumer. */
  private[operators] val gopherCtesSql: String = {
    val words = "regexp_extract_all(text, '\\S+')"
    val lines = "string_split(text, chr(10))"
    val stops = gopherStops.map(s =>
      s"CASE WHEN regexp_matches(lower(text), '\\b$s\\b') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""sig AS (
      |  SELECT doc_id,
      |    CAST(len($words) AS BIGINT) AS n_words,
      |    CAST(len($lines) AS BIGINT) AS n_lines,
      |    CAST(coalesce(list_sum(list_transform($words, x -> length(x))), 0)
      |      AS BIGINT) AS sum_wlen,
      |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS BIGINT) AS n_sym,
      |    CAST(len(list_filter($lines,
      |      x -> regexp_matches(x, '^\\s*[-*•‣▪]'))) AS BIGINT) AS n_bullet,
      |    CAST(len(list_filter($lines,
      |      x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT) AS n_ellipsis,
      |    CAST(len(list_filter($words,
      |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
      |    CAST($stops AS BIGINT) AS n_stop
      |  FROM documents
      |), bp AS (
      |  SELECT doc_id, n_words, n_lines, n_stop,
      |    CAST(sum_wlen * 100 // greatest(n_words, 1) AS BIGINT) AS mwl_e2,
      |    CAST(n_sym * 10000 // greatest(n_words, 1) AS BIGINT) AS sym_bp,
      |    CAST(n_bullet * 10000 // n_lines AS BIGINT) AS bullet_bp,
      |    CAST(n_ellipsis * 10000 // n_lines AS BIGINT) AS ellipsis_bp,
      |    CAST(n_alpha * 10000 // greatest(n_words, 1) AS BIGINT) AS alpha_bp
      |  FROM sig
      |)""".stripMargin
  }

  /** Per-rule SQL predicates, ONE threshold source like [[gopherRules]]
    * (keep = conjunction; quality score = count of passes). */
  private[operators] val gopherRulesSql: Seq[String] = Seq(
    "n_words BETWEEN 50 AND 100000", "mwl_e2 BETWEEN 300 AND 1000",
    "sym_bp <= 1000", "bullet_bp <= 9000", "ellipsis_bp <= 3000",
    "alpha_bp >= 8000", "n_stop >= 2")

  private val gopherKeepPredSql: String = gopherRulesSql.mkString(" AND ")

  val corpusGopherFilterSql: String =
    s"""WITH $gopherCtesSql
      |SELECT doc_id, n_words, n_lines, n_stop, mwl_e2, sym_bp, bullet_bp,
      |  ellipsis_bp, alpha_bp,
      |  CAST(CASE WHEN $gopherKeepPredSql THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM bp ORDER BY doc_id""".stripMargin

  /** End-to-end curation decision — the ONE call a pretraining pipeline
    * actually ships: per document the verdict of every keep stage
    * (quality = the gopher rule set, duplication = dedup-cluster
    * representative, contamination = benchmark 5-gram overlap, benchmark
    * membership itself) plus the composed `final_keep` bit and the FIRST
    * failing stage as `reason` — the audit column a curation review reads
    * ("why did we drop 12% of src4?"). Composes the three gates it
    * derives from ([[corpusGopherFilterOf]], `Dedup.clusterLabels`,
    * `Dedup.corpusDecontaminate`) rather than re-implementing any rule;
    * the oracle composes the SAME factored SQL fragments (gopher CTEs +
    * keep predicate, the recursive cluster CTE, the decontamination
    * shingle CTEs), so a threshold edit anywhere propagates to both
    * engines or fails the gate loudly.
    *
    * Plan shape: gopher signals are map-side per-doc expressions; cluster
    * labels come from the persisted artifact (the dedup pass runs once
    * per corpus); contamination is the df-bounded benchmark shingle join;
    * the three flag tables co-join on the doc_id exchange. */
  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val gopher = corpusGopherFilterOf(docs)
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    val clusters = graft.operators.Dedup.clusterLabels(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("dedup_keep"))
    val contam = graft.operators.Dedup.corpusDecontaminate(spark, dir)
      .select(col("doc_id"), lit(1L).as("cflag"))
    docs.select(col("doc_id"))
      .join(gopher, Seq("doc_id"))
      .join(clusters, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("contaminated", when(col("cflag").isNotNull, 1L).otherwise(0L))
      .withColumn("is_benchmark",
        when(pmod(col("doc_id"), lit(97L)) === 0, 1L).otherwise(0L))
      .withColumn("final_keep",
        when(col("is_benchmark") === 0 && col("gopher_keep") === 1 &&
          col("dedup_keep") === 1 && col("contaminated") === 0, 1L).otherwise(0L))
      .withColumn("reason",
        when(col("is_benchmark") === 1, "benchmark")
          .when(col("gopher_keep") === 0, "quality")
          .when(col("dedup_keep") === 0, "duplicate")
          .when(col("contaminated") === 1, "contaminated")
          .otherwise("kept"))
      .select(col("doc_id"), col("gopher_keep"), col("dedup_keep"),
        col("contaminated"), col("is_benchmark"), col("final_keep"), col("reason"))
      .orderBy(col("doc_id"))
  }

  val corpusCurateSql: String =
    s"""${graft.operators.Dedup.dedupClustersSqlCte},
      |${graft.operators.Dedup.decontaminateShinglesSqlCte},
      |$gopherCtesSql,
      |contam AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b ON c.s = b.s),
      |flags AS (
      |  SELECT d.doc_id,
      |    CAST(CASE WHEN $gopherKeepPredSql THEN 1 ELSE 0 END AS BIGINT)
      |      AS gopher_keep,
      |    CAST(CASE WHEN cl.cluster_id = d.doc_id THEN 1 ELSE 0 END AS BIGINT)
      |      AS dedup_keep,
      |    CAST(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |      AS contaminated,
      |    CAST(CASE WHEN d.doc_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |      AS is_benchmark
      |  FROM documents d
      |  JOIN bp USING (doc_id)
      |  JOIN cl USING (doc_id)
      |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
      |)
      |SELECT doc_id, gopher_keep, dedup_keep, contaminated, is_benchmark,
      |  CAST(CASE WHEN is_benchmark = 0 AND gopher_keep = 1 AND dedup_keep = 1
      |    AND contaminated = 0 THEN 1 ELSE 0 END AS BIGINT) AS final_keep,
      |  CASE WHEN is_benchmark = 1 THEN 'benchmark'
      |       WHEN gopher_keep = 0 THEN 'quality'
      |       WHEN dedup_keep = 0 THEN 'duplicate'
      |       WHEN contaminated = 1 THEN 'contaminated'
      |       ELSE 'kept' END AS reason
      |FROM flags ORDER BY doc_id""".stripMargin

  /** Per-doc lexical diversity: type-token ratio and hapax fraction —
    * the cheap templated-text / boilerplate detector (machine-generated
    * spam repeats a tiny vocabulary; natural prose at gate lengths keeps
    * TTR high and a large once-only tail, Zipf's law). Tokens are the
    * [a-z0-9]+ word alphabet shared with the TF-IDF/PMI family.
    *
    * Plan: the heavy exchange is the (doc_id, token) partial-aggregated
    * count — combine-heavy (a doc's repeated tokens collapse map-side),
    * never the raw token stream — then a doc-grain rollup and a left
    * join back to documents so token-free docs emit zeros (DIV guards
    * clamp their denominators). Ratios are truncating-DIV basis points,
    * engine-exact. */
  def textTtr(spark: SparkSession, dir: String): DataFrame =
    textTtrOf(Tables.documents(spark, dir))

  def textTtrOf(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
    val per = tf.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 10000 DIV greatest(n_tokens, 1)").as("ttr_bp"),
        expr("n_hapax * 10000 DIV greatest(n_types, 1)").as("hapax_bp"))
      .orderBy(col("doc_id"))
  }

  val textTtrSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$word')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
      |), per AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |  FROM tf GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
      |  coalesce(p.n_types, 0) AS n_types, coalesce(p.n_hapax, 0) AS n_hapax,
      |  CAST(coalesce(p.n_types, 0) * 10000
      |    // greatest(coalesce(p.n_tokens, 0), 1) AS BIGINT) AS ttr_bp,
      |  CAST(coalesce(p.n_hapax, 0) * 10000
      |    // greatest(coalesce(p.n_types, 0), 1) AS BIGINT) AS hapax_bp
      |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Code-vs-prose detection — the routing signal a mixed web corpus needs
    * before language-specific pipelines (code wants its own dedup
    * granularity, quality rules and mixing weight; prose filters mangle
    * it): per doc, exact-integer code signals — code-symbol density
    * ({}();=<>[] per char), indented-line fraction (≥2 spaces or tab),
    * distinct programming keywords present (15-word set), and
    * camelCase/snake_case identifier fraction — plus an is_code flag from
    * a documented rule (symbols+keywords, or heavy indentation, or
    * identifiers+a keyword). A heuristic by construction (like langid's
    * stopword votes), but an engine-exact one: every signal is a count or
    * truncating-DIV bp, so the flag needs no margin discipline.
    *
    * Plan: doc-local narrow scan, zero shuffles before the gate sort. */
  def textCodeDetect(spark: SparkSession, dir: String): DataFrame =
    textCodeDetectOf(Tables.documents(spark, dir))

  private val codeKeywords = Seq("def", "return", "import", "class", "function",
    "const", "var", "void", "int", "for", "while", "if", "else", "public", "static")

  def textCodeDetectOf(docs: DataFrame): DataFrame = {
    val nChars = greatest(length(col("text")).cast("long"), lit(1L))
    val nWords = size(org.apache.spark.sql.functions.expr(
      "regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
    val nLines = size(split(col("text"), "\n", -1)).cast("long")
    val nSym = size(regexp_extract_all(col("text"),
      lit("[{}();=<>\\[\\]]"), lit(0))).cast("long")
    val nIndent = org.apache.spark.sql.functions.expr(
      "size(filter(split(text, '\\n', -1), x -> x rlike '^(  |\\t)'))").cast("long")
    // camelCase bump or an inner underscore between alphanumerics —
    // deliberately unanchored: identifiers arrive wrapped in call syntax
    // ("parse_args(argv);" is one \S+ token)
    val nIdent = org.apache.spark.sql.functions.expr(
      "size(filter(regexp_extract_all(text, '\\\\S+', 0), " +
        "x -> x rlike '[a-z][A-Z]|[A-Za-z0-9]_[A-Za-z0-9]'))").cast("long")
    val nKw = codeKeywords.map(k =>
      when(col("text").rlike(s"\\b$k\\b"), 1L).otherwise(0L)).reduce(_ + _)
    docs
      .select(col("doc_id"), nChars.as("nc"), greatest(nWords, lit(1L)).as("nw"),
        nLines.as("nl"), nSym.as("n_sym"), nIndent.as("n_indent"),
        nIdent.as("n_ident"), nKw.as("n_kw"))
      .select(col("doc_id"), col("n_kw"),
        expr("n_sym * 10000 DIV nc").as("sym_bp"),
        expr("n_indent * 10000 DIV nl").as("indent_bp"),
        expr("n_ident * 10000 DIV nw").as("ident_bp"))
      .withColumn("is_code",
        ((col("sym_bp") >= 250L && col("n_kw") >= 2L) ||
          col("indent_bp") >= 3000L ||
          (col("ident_bp") >= 1000L && col("n_kw") >= 1L)).cast("long"))
      .orderBy(col("doc_id"))
  }

  val textCodeDetectSql: String = {
    val kws = codeKeywords.map(k =>
      s"CASE WHEN regexp_matches(text, '\\b$k\\b') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sig AS (
      |  SELECT doc_id,
      |    greatest(CAST(length(text) AS BIGINT), 1) AS nc,
      |    greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 1) AS nw,
      |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
      |    CAST(len(regexp_extract_all(text, '[{}();=<>\\[\\]]')) AS BIGINT) AS n_sym,
      |    CAST(len(list_filter(string_split(text, chr(10)),
      |      x -> regexp_matches(x, '^(  |\\t)'))) AS BIGINT) AS n_indent,
      |    CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
      |      x -> regexp_matches(x, '[a-z][A-Z]|[A-Za-z0-9]_[A-Za-z0-9]')))
      |      AS BIGINT) AS n_ident,
      |    CAST($kws AS BIGINT) AS n_kw
      |  FROM documents
      |), bp AS (
      |  SELECT doc_id, n_kw,
      |    CAST(n_sym * 10000 // nc AS BIGINT) AS sym_bp,
      |    CAST(n_indent * 10000 // nl AS BIGINT) AS indent_bp,
      |    CAST(n_ident * 10000 // nw AS BIGINT) AS ident_bp
      |  FROM sig
      |)
      |SELECT doc_id, n_kw, sym_bp, indent_bp, ident_bp,
      |  CAST(CASE WHEN (sym_bp >= 250 AND n_kw >= 2) OR indent_bp >= 3000
      |    OR (ident_bp >= 1000 AND n_kw >= 1) THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_code
      |FROM bp ORDER BY doc_id""".stripMargin
  }

  /** Residual-markup detection — the boilerplate-extraction audit (a web
    * corpus whose HTML stripper missed a subtree ships tag soup into
    * training; distinct from [[textCodeDetect]]: markup is structure that
    * should have been REMOVED, code is content that should be ROUTED):
    * per doc, counts of HTML-ish tags (<...>), character entity
    * references (&amp;-style, numeric included), and http(s) URLs, plus
    * tag density per char and an is_markup flag from a documented rule
    * (tag density, or repeated entities, or tags alongside links). Exact
    * integers throughout; one doc-local narrow pass, zero shuffles. */
  def textMarkupDetect(spark: SparkSession, dir: String): DataFrame =
    textMarkupDetectOf(Tables.documents(spark, dir))

  def textMarkupDetectOf(docs: DataFrame): DataFrame = {
    val nChars = greatest(length(col("text")).cast("long"), lit(1L))
    val nTags = size(regexp_extract_all(col("text"),
      lit("</?[A-Za-z][^>]*>"), lit(0))).cast("long")
    val nEnts = size(regexp_extract_all(col("text"),
      lit("&[A-Za-z]+;|&#[0-9]+;"), lit(0))).cast("long")
    val nLinks = size(regexp_extract_all(col("text"),
      lit("https?://[^\\s]+"), lit(0))).cast("long")
    docs
      .select(col("doc_id"), nChars.as("nc"), nTags.as("n_tags"),
        nEnts.as("n_entities"), nLinks.as("n_links"))
      .select(col("doc_id"), col("n_tags"), col("n_entities"), col("n_links"),
        expr("n_tags * 10000 DIV nc").as("tag_bp"))
      .withColumn("is_markup",
        (col("tag_bp") >= 100L || col("n_entities") >= 3L ||
          (col("n_tags") >= 2L && col("n_links") >= 1L)).cast("long"))
      .orderBy(col("doc_id"))
  }

  val textMarkupDetectSql: String =
    """WITH sig AS (
      |  SELECT doc_id,
      |    greatest(CAST(length(text) AS BIGINT), 1) AS nc,
      |    CAST(len(regexp_extract_all(text, '</?[A-Za-z][^>]*>')) AS BIGINT)
      |      AS n_tags,
      |    CAST(len(regexp_extract_all(text, '&[A-Za-z]+;|&#[0-9]+;')) AS BIGINT)
      |      AS n_entities,
      |    CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT)
      |      AS n_links
      |  FROM documents
      |)
      |SELECT doc_id, n_tags, n_entities, n_links,
      |  CAST(n_tags * 10000 // nc AS BIGINT) AS tag_bp,
      |  CAST(CASE WHEN n_tags * 10000 // nc >= 100 OR n_entities >= 3
      |    OR (n_tags >= 2 AND n_links >= 1) THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_markup
      |FROM sig ORDER BY doc_id""".stripMargin

  /** Cluster labeling — "what IS semantic cell 0x5b": top-3 TF-IDF terms
    * per embedding cell, the report a curator reads next to
    * [[Similarity.corpusSemanticSample]]'s per-cell keep decisions (a
    * balanced sample of unlabeled clusters is unreviewable). Cells here
    * are the 8-bit SIGN-BIT code of the first 8 embedding dims — an
    * engine-exact cell function (raw float sign comparisons, no
    * arithmetic), the same role the sign-bit quantizer plays for the
    * corpus_semantic_mix twin: the trained-quantizer variant is this op
    * with the cell column swapped for the zero-shuffle argmax assignment.
    * IDF is at CELL grain (ln(n_cells/df_cells)·1e4, the corpus_tfidf
    * rounding discipline — margins pinned in LogGateMarginSpec), so a
    * term scores high when frequent in this cell and absent from others.
    *
    * Plan: one doc↔cell equi-join (id-keyed), token explode
    * partial-aggregates to (cell, word) — the fact exchange,
    * combine-heavy — df/n_cells ride that aggregate (cells×vocab grain),
    * top-3 window partitions by cell. */
  def corpusCellTopics(spark: SparkSession, dir: String): DataFrame =
    corpusCellTopicsOf(Tables.documents(spark, dir), Tables.embeddings(spark, dir))

  def corpusCellTopicsOf(docs: DataFrame, emb: DataFrame): DataFrame = {
    val cellCol = (0 until 8).map(b =>
      when(element_at(col("embedding"), b + 1) >= 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
    cellTopicsOf(docs, emb.select(col("vec_id"), cellCol.as("cell")))
  }

  /** The shared labeling pipeline over ANY (vec_id, cell) assignment. */
  def cellTopicsOf(docs: DataFrame, cells: DataFrame): DataFrame = {
    val toks = docs.join(cells, docs("doc_id") === cells("vec_id"))
      .select(col("cell"),
        explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("w"))
    val ctf = toks.groupBy(col("cell"), col("w")).agg(count(lit(1)).as("ctf"))
    val dfc = ctf.groupBy(col("w")).agg(count(lit(1)).as("df_cells"))
    val nCells = ctf.select(col("cell")).distinct().agg(count(lit(1)).as("n_cells"))
    val scored = ctf.join(dfc, "w").crossJoin(broadcast(nCells))
      .withColumn("idf_e4",
        round(log(col("n_cells").cast("double") / col("df_cells")) * 10000).cast("long"))
      .withColumn("score_e4", col("ctf") * col("idf_e4"))
    val wTop = Window.partitionBy(col("cell"))
      .orderBy(col("score_e4").desc, col("w"))
    scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
      .select(col("cell"), col("rn").cast("long").as("rn"), col("w"),
        col("ctf"), col("df_cells"), col("score_e4"))
      .orderBy(col("cell"), col("rn"))
  }

  val corpusCellTopicsSql: String = {
    val cell = (0 until 8).map(b =>
      s"(CASE WHEN embedding[${b + 1}] >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH cells AS (
      |  SELECT vec_id, CAST($cell AS BIGINT) AS cell FROM embeddings
      |), tok AS (
      |  SELECT c.cell, unnest(regexp_extract_all(lower(d.text), '$word')) AS w
      |  FROM documents d JOIN cells c ON d.doc_id = c.vec_id
      |), ctf AS (
      |  SELECT cell, w, CAST(count(*) AS BIGINT) AS ctf FROM tok GROUP BY 1, 2
      |), dfc AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS df_cells FROM ctf GROUP BY 1
      |), nc AS (
      |  SELECT CAST(count(DISTINCT cell) AS BIGINT) AS n_cells FROM ctf
      |)
      |SELECT cell, rn, w, ctf, df_cells, score_e4 FROM (
      |  SELECT c.cell, c.w, c.ctf, d.df_cells,
      |    c.ctf * CAST(round(ln(n.n_cells::DOUBLE / d.df_cells) * 10000, 0)
      |      AS BIGINT) AS score_e4,
      |    row_number() OVER (PARTITION BY c.cell ORDER BY
      |      c.ctf * CAST(round(ln(n.n_cells::DOUBLE / d.df_cells) * 10000, 0)
      |        AS BIGINT) DESC, c.w) AS rn
      |  FROM ctf c JOIN dfc d USING (w) CROSS JOIN nc n)
      |WHERE rn <= 3 ORDER BY cell, rn""".stripMargin
  }

  /** [[corpusCellTopics]] over the TRAINED quantizer's cells — the
    * production cluster-labeling pass (the cells a curator actually
    * samples/mixes by, via [[Similarity.corpusSemanticSample]]'s
    * zero-shuffle argmax assignment). Same downstream pipeline to the
    * letter — only the cell column differs — so the oracle-gated
    * sign-bit sibling hash-proves the TF-IDF/top-k machinery and this
    * stays rows-only solely for the float argmax (the corpus_semantic_mix
    * twin discipline, inverted: here the TWIN is the gated one). */
  def corpusClusterTopics(spark: SparkSession, dir: String): DataFrame = {
    val centroids = Similarity.loadOrTrainCentroids(spark, dir)
    val best = Similarity.nearestCellStructAuto(col("embedding"), centroids)
    val cells = Tables.embeddings(spark, dir)
      .select(col("vec_id"), best.getField("cell").cast("long").as("cell"))
    cellTopicsOf(Tables.documents(spark, dir), cells)
  }

  /** DuckDB-provable twin of `corpus_cluster_topics`: the trained float
    * k-means assignment (the one layer DuckDB can't replay) is swapped
    * for a deterministic SEED-ARGMAX replay — centroids are the 16
    * vectors with the smallest engine-portable id hash
    * ([[TextAnalysis.idHash]]), assignment is the argmax of the
    * ×1000-quantized cosine (exact integer dot/norms, one IEEE
    * division + sqrt — the knn_brute_oracle arithmetic), ties to the
    * smallest seed id. Unlike the sign-bit sibling `corpus_cell_topics`
    * (which hash-proves only the TF-IDF/top-k tail), this twin also
    * drives the nearest-centroid ASSIGNMENT machinery cross-engine.
    * Cells are labeled by seed vec_id. Twin-scale note: the per-vector
    * argmax here is a groupBy over N×16 partial-aggregated rows — the
    * production op keeps the zero-shuffle argmax expression. */
  def corpusClusterTopicsOracle(spark: SparkSession, dir: String): DataFrame =
    cellTopicsOf(Tables.documents(spark, dir),
      clusterTopicsOracleCells(spark, dir))

  /** The twin's (vec_id, cell) assignment — cells labeled by seed vec_id. */
  private[graft] def clusterTopicsOracleCells(spark: SparkSession,
                                              dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qv"))
    val seeds = emb
      .select(col("vec_id").as("seed_id"), col("qv").as("sv"),
        TextAnalysis.idHash(col("vec_id")).as("h"))
      .orderBy(col("h"), col("seed_id")).limit(16)
      .select(col("seed_id"), col("sv"))
    // deterministic argmax as a struct-max aggregate: equal cosines
    // resolve to the larger negated seed id = the SMALLEST seed id
    emb.crossJoin(broadcast(seeds))
      .withColumn("cos", call_function("quantized_cosine", col("qv"), col("sv")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos").as("c"), (-col("seed_id")).as("ns"))).as("m"))
      .select(col("vec_id"), (-col("m.ns")).as("cell"))
  }

  val corpusClusterTopicsOracleSql: String =
    s"""WITH e AS MATERIALIZED (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS qv
      |  FROM embeddings
      |), sd AS MATERIALIZED (
      |  SELECT seed_id, sv FROM (
      |    SELECT vec_id AS seed_id, qv AS sv,
      |      row_number() OVER (
      |        ORDER BY ${TextAnalysis.idHashSql("vec_id")}, vec_id) AS rn
      |    FROM e) WHERE rn <= 16
      |), sc AS (
      |  SELECT e.vec_id, sd.seed_id,
      |    list_sum(list_transform(range(1, len(e.qv) + 1), i -> e.qv[i]*sd.sv[i]))::DOUBLE
      |      / sqrt(greatest(
      |          list_sum(list_transform(e.qv, x -> x*x))::DOUBLE
      |          * list_sum(list_transform(sd.sv, x -> x*x))::DOUBLE, 1.0)) AS cos
      |  FROM e CROSS JOIN sd
      |), cells AS MATERIALIZED (
      |  SELECT vec_id, seed_id AS cell FROM (
      |    SELECT vec_id, seed_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
      |    FROM sc) WHERE rn = 1
      |), tok AS (
      |  SELECT c.cell, unnest(regexp_extract_all(lower(d.text), '$word')) AS w
      |  FROM documents d JOIN cells c ON d.doc_id = c.vec_id
      |), ctf AS (
      |  SELECT cell, w, CAST(count(*) AS BIGINT) AS ctf FROM tok GROUP BY 1, 2
      |), dfc AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS df_cells FROM ctf GROUP BY 1
      |), nc AS (
      |  SELECT CAST(count(DISTINCT cell) AS BIGINT) AS n_cells FROM ctf
      |)
      |SELECT cell, rn, w, ctf, df_cells, score_e4 FROM (
      |  SELECT c.cell, c.w, c.ctf, d.df_cells,
      |    c.ctf * CAST(round(ln(n.n_cells::DOUBLE / d.df_cells) * 10000, 0)
      |      AS BIGINT) AS score_e4,
      |    row_number() OVER (PARTITION BY c.cell ORDER BY
      |      c.ctf * CAST(round(ln(n.n_cells::DOUBLE / d.df_cells) * 10000, 0)
      |        AS BIGINT) DESC, c.w) AS rn
      |  FROM ctf c JOIN dfc d USING (w) CROSS JOIN nc n)
      |WHERE rn <= 3 ORDER BY cell, rn""".stripMargin

  /** Curation cross-tab — quality × duplication per language, the
    * diagnostics table a curator reads before ordering the pipeline
    * (dedup-then-filter and filter-then-dedup keep different corpora;
    * the off-diagonal cells say how much): quality = the
    * [[corpusGopherFilter]] keep bit, duplication = exact-md5 duplicate
    * (any doc whose text hash already appeared on a smaller doc_id — the
    * dedup_exact keeper rule). Emits (lang, quality_keep, is_dup, n_docs,
    * share_bp of the language) — exact integers.
    *
    * Plan: the gopher signals are doc-local; the dup bit is one md5
    * window over hash partitions (count-only — no pair fan-out, the
    * text_memorization discipline); one (lang, bits) rollup. */
  def corpusCurationMatrix(spark: SparkSession, dir: String): DataFrame =
    corpusCurationMatrixOf(Tables.documents(spark, dir))

  def corpusCurationMatrixOf(docs: DataFrame): DataFrame = {
    val keep = corpusGopherFilterOf(docs).select(col("doc_id"), col("keep"))
    val dup = docs
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .withColumn("min_id", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .select(col("doc_id"), col("lang"),
        (col("doc_id") =!= col("min_id")).cast("long").as("is_dup"))
    val cells = dup.join(keep, "doc_id")
      .groupBy(col("lang"), col("keep").as("quality_keep"), col("is_dup"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("lang"))
    cells
      .withColumn("n_lang", sum(col("n_docs")).over(w))
      .select(col("lang"), col("quality_keep"), col("is_dup"), col("n_docs"),
        expr("n_docs * 10000 DIV n_lang").as("share_bp"))
      .orderBy(col("lang"), col("quality_keep"), col("is_dup"))
  }

  val corpusCurationMatrixSql: String = {
    s"""WITH $gopherCtesSql, keepbit AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN $gopherKeepPredSql THEN 1 ELSE 0 END AS BIGINT)
      |      AS quality_keep
      |  FROM bp
      |), dup AS (
      |  SELECT doc_id, lang,
      |    CAST(CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
      |      THEN 1 ELSE 0 END AS BIGINT) AS is_dup
      |  FROM documents
      |), cells AS (
      |  SELECT d.lang, k.quality_keep, d.is_dup,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM dup d JOIN keepbit k USING (doc_id)
      |  GROUP BY 1, 2, 3
      |)
      |SELECT lang, quality_keep, is_dup, n_docs,
      |  CAST(n_docs * 10000 //
      |    (sum(n_docs) OVER (PARTITION BY lang)) AS BIGINT) AS share_bp
      |FROM cells ORDER BY lang, quality_keep, is_dup""".stripMargin
  }

  /** One-call data card — the long-form (metric, value) summary a corpus
    * release ships (Datasheets for Datasets, Gebru et al. CACM'21;
    * every HF dataset card carries exactly these counts): corpus sizes,
    * per-language doc counts, exact-duplicate mass, Gopher-quality pass
    * mass, and char-length extremes, in ONE table a release pipeline can
    * diff between versions. Long-form scalar rows by design (the gate
    * discipline), every value an exact BIGINT.
    *
    * Plan: three independent partial-aggregated passes (global sums,
    * per-lang counts, md5-window dup count) union entity-grain rows —
    * no pass depends on another, Catalyst runs them as parallel
    * subtrees. */
  def corpusDatacard(spark: SparkSession, dir: String): DataFrame =
    corpusDatacardOf(Tables.documents(spark, dir))

  def corpusDatacardOf(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), col("text"),
      length(col("text")).cast("long").as("nc"),
      size(org.apache.spark.sql.functions.expr(
        "regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("nw"))
    val global = base.agg(
        count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("nw")).as("n_ws_tokens"),
        count_distinct(col("lang")).as("n_langs"),
        min(col("nc")).as("min_chars"), max(col("nc")).as("max_chars"))
      .select(org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.map(
        lit("n_docs"), col("n_docs"), lit("n_chars"), col("n_chars"),
        lit("n_ws_tokens"), col("n_ws_tokens"), lit("n_langs"), col("n_langs"),
        lit("min_chars"), col("min_chars"), lit("max_chars"), col("max_chars")))
        .as(Seq("metric", "value")))
    val perLang = base.groupBy(col("lang")).agg(count(lit(1)).as("value"))
      .select(concat(lit("docs_lang_"), col("lang")).as("metric"), col("value"))
    val dups = base
      .withColumn("min_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .agg(sum(when(col("doc_id") =!= col("min_id"), 1L).otherwise(0L))
        .as("value"))
      .select(lit("exact_dup_docs").as("metric"), col("value"))
    val keep = corpusGopherFilterOf(docs)
      .agg(sum(col("keep")).as("value"))
      .select(lit("gopher_keep_docs").as("metric"), col("value"))
    global.unionByName(perLang).unionByName(dups).unionByName(keep)
      .orderBy(col("metric"))
  }

  val corpusDatacardSql: String = {
    s"""WITH $gopherCtesSql, base AS (
      |  SELECT doc_id, lang, text, CAST(length(text) AS BIGINT) AS nc,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nw
      |  FROM documents
      |), g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nc) AS BIGINT) AS n_chars,
      |    CAST(sum(nw) AS BIGINT) AS n_ws_tokens,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(min(nc) AS BIGINT) AS min_chars,
      |    CAST(max(nc) AS BIGINT) AS max_chars
      |  FROM base
      |)
      |SELECT metric, value FROM (
      |  SELECT 'n_docs' AS metric, n_docs AS value FROM g
      |  UNION ALL SELECT 'n_chars', n_chars FROM g
      |  UNION ALL SELECT 'n_ws_tokens', n_ws_tokens FROM g
      |  UNION ALL SELECT 'n_langs', n_langs FROM g
      |  UNION ALL SELECT 'min_chars', min_chars FROM g
      |  UNION ALL SELECT 'max_chars', max_chars FROM g
      |  UNION ALL SELECT 'docs_lang_' || lang, CAST(count(*) AS BIGINT)
      |    FROM base GROUP BY lang
      |  UNION ALL SELECT 'exact_dup_docs', CAST(sum(d) AS BIGINT) FROM (
      |    SELECT CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
      |      THEN 1 ELSE 0 END AS d FROM base)
      |  UNION ALL SELECT 'gopher_keep_docs',
      |    CAST(sum(CASE WHEN $gopherKeepPredSql THEN 1 ELSE 0 END) AS BIGINT)
      |    FROM bp
      |)
      |ORDER BY metric""".stripMargin
  }

  /** Vocabulary coverage curve — the tokenizer-sizing statistic (what
    * fraction of token OCCURRENCES do the top-k types cover; the answer
    * decides vocab size and the UNK budget): coverage at k ∈ {100, 1000,
    * 10000} in exact basis points. Computed at FREQUENCY-BIN grain — all
    * types in a bin share one frequency, so "which k types" never needs a
    * global (freq, token) sort over the vocabulary (single-partition at
    * corpus scale): covered(k) = Σ_bins f · clamp(k − cum_types_before,
    * 0, bin_types), a per-k aggregate over bins whose cardinality is
    * bounded by the distinct-frequency VALUE range. Boundary-bin types
    * are interchangeable by construction — the tie needs no order. */
  def corpusVocabCoverage(spark: SparkSession, dir: String): DataFrame =
    corpusVocabCoverageOf(Tables.documents(spark, dir))

  private val CoverageKs = Seq(100L, 1000L, 10000L)

  def corpusVocabCoverageOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = docs
      .select(explode(regexp_extract_all(lower(col("text")), lit(word), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val bins = freq.groupBy(col("f")).agg(count(lit(1)).as("n_types"))
    val wdesc = Window.orderBy(col("f").desc) // bin-grain rows only
    val cum = bins.withColumn("cum_before",
      coalesce(sum(col("n_types")).over(
        wdesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ks = CoverageKs.toDF("k")
    cum.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(
        sum(col("f") * col("n_types")).as("total_occ"),
        sum(col("n_types")).as("n_types_total"),
        sum(col("f") * greatest(lit(0L),
          least(col("n_types"), col("k") - col("cum_before")))).as("covered_occ"))
      .select(col("k"), col("n_types_total"), col("total_occ"), col("covered_occ"),
        expr("covered_occ * 10000 DIV greatest(total_occ, 1)").as("covered_bp"))
      .orderBy(col("k"))
  }

  val corpusVocabCoverageSql: String =
    s"""WITH tok AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '$word')) AS w
      |  FROM documents
      |), freq AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1
      |), bins AS (
      |  SELECT f, CAST(count(*) AS BIGINT) AS n_types FROM freq GROUP BY 1
      |), cum AS (
      |  SELECT f, n_types,
      |    CAST(coalesce(sum(n_types) OVER (ORDER BY f DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM bins
      |)
      |SELECT k, CAST(sum(n_types) AS BIGINT) AS n_types_total,
      |  CAST(sum(f * n_types) AS BIGINT) AS total_occ,
      |  CAST(sum(f * greatest(0, least(n_types, k - cum_before))) AS BIGINT)
      |    AS covered_occ,
      |  CAST(sum(f * greatest(0, least(n_types, k - cum_before))) * 10000
      |    // greatest(sum(f * n_types), 1) AS BIGINT) AS covered_bp
      |FROM cum CROSS JOIN (VALUES (CAST(100 AS BIGINT)), (1000), (10000)) AS t(k)
      |GROUP BY k ORDER BY k""".stripMargin

  /** Per-doc unicode-script profile — the mixed-script signal (spam and
    * encoding mojibake mix scripts; genuine text is script-coherent, and
    * a latin doc suddenly 30% cyrillic is a classic homoglyph attack):
    * counts per script class (latin / cyrillic / cjk / arabic / greek /
    * digit / other-letter) over the SCRIPT-BEARING chars (whitespace and
    * punctuation are script-neutral and excluded from the base), the
    * dominant script's share in bp, and a mixed flag when the runner-up
    * class holds ≥ 10% of script chars. The `other` class is the true
    * complement — any LETTER outside the six named ranges (Hebrew, Thai,
    * Devanagari, …) — via a negated class `[^\\P{L}<named>]` ("not a
    * non-letter and not in a named range"), so homoglyph mixes in
    * unlisted scripts still read as mixed. Exact integers; Java∩RE2
    * unicode ranges (explicit code-point classes plus the \\p{L}
    * category both engines share, no \\p{Script=} — DuckDB's RE2 spells
    * those differently); doc-local, zero shuffles. */
  def textScriptMix(spark: SparkSession, dir: String): DataFrame =
    textScriptMixOf(Tables.documents(spark, dir))

  private val namedLetterRanges: String =
    "A-Za-z\\x{00C0}-\\x{024F}" +           // latin
      "\\x{0400}-\\x{04FF}" +               // cyrillic
      "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}" + // cjk
      "\\x{0600}-\\x{06FF}" +               // arabic
      "\\x{0370}-\\x{03FF}"                 // greek

  private val scriptClasses: Seq[(String, String)] = Seq(
    "latin"    -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "cjk"      -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]",
    "arabic"   -> "[\\x{0600}-\\x{06FF}]",
    "greek"    -> "[\\x{0370}-\\x{03FF}]",
    "digit"    -> "[0-9]",
    // letters NOT in any named range: negated union of "non-letter" and
    // the named ranges — RE2 and Java agree on \P{L} inside a class
    "other"    -> s"[^\\P{L}$namedLetterRanges]")

  def textScriptMixOf(docs: DataFrame): DataFrame = {
    val counts = scriptClasses.map { case (nm, re) =>
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long").as(s"n_$nm")
    }
    val names = scriptClasses.map(c => s"n_${c._1}")
    docs.select(col("doc_id") +: counts: _*)
      .withColumn("n_script", names.map(col).reduce(_ + _))
      // runner-up via the sorted count vector; the array is dropped below
      // (scalar-only gate rule)
      .withColumn("sorted_arr",
        sort_array(array(names.map(col): _*), asc = false))
      .select(col("doc_id") +: names.map(col) :+ col("n_script") :+
        expr("element_at(sorted_arr, 1) * 10000 DIV greatest(n_script, 1)")
          .as("dom_share_bp") :+
        ((element_at(col("sorted_arr"), 2) * lit(10L) >= col("n_script")) &&
          col("n_script") > 0L).cast("long").as("mixed"): _*)
      .orderBy(col("doc_id"))
  }

  val textScriptMixSql: String = {
    val cols = scriptClasses.map { case (nm, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$nm"
    }.mkString(",\n      |    ")
    val names = scriptClasses.map(c => s"n_${c._1}")
    val total = names.mkString(" + ")
    val arr = s"list_reverse_sort([${names.mkString(", ")}])"
    s"""WITH sig AS (
      |  SELECT doc_id,
      |    $cols
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, ${names.mkString(", ")},
      |    CAST($total AS BIGINT) AS n_script,
      |    $arr AS sorted_arr
      |  FROM sig
      |)
      |SELECT doc_id, ${names.mkString(", ")}, n_script,
      |  CAST(sorted_arr[1] * 10000 // greatest(n_script, 1) AS BIGINT)
      |    AS dom_share_bp,
      |  CAST(CASE WHEN sorted_arr[2] * 10 >= n_script AND n_script > 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS mixed
      |FROM t ORDER BY doc_id""".stripMargin
  }

  /** Per-doc n-gram NOVELTY against everything earlier in the corpus —
    * the train-time memorization-exposure score (Lee et al. ACL'22 /
    * RETRO's eval-novelty methodology, turned into a per-doc curation
    * signal): the fraction of a doc's distinct word 5-grams whose FIRST
    * corpus occurrence (min doc_id) is an earlier doc. Low novel_bp =
    * the doc is mostly recombined seen text (boilerplate, syndication,
    * template spam) even when no single pair clears a dedup threshold —
    * the duplication mass dedup's pairwise view cannot see.
    *
    * Plan shape: one explode of distinct hashed 5-grams, first-occurrence
    * as a min WINDOW over the shingle hash (rides the one shingle
    * exchange — no self-join, no first-occurrence table join-back), then
    * the per-doc aggregate; each exploded row carries its doc's set size
    * so no second scan computes it (the dedup_ngram discipline). Docs
    * too short for a 5-gram surface with n_shingles = 0, novel_bp = 0.
    * Scale: the window state per shingle hash is one running min —
    * df-skewed shingles (boilerplate) cost their row count, not df². */
  def corpusNovelty(spark: SparkSession, dir: String): DataFrame =
    corpusNoveltyOf(Tables.documents(spark, dir))

  def corpusNoveltyOf(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      array_distinct(Dedup.hashedNgrams(col("text"), 5)).as("sh"))
    val ex = d.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("h"))
    val firstDoc = min(col("doc_id")).over(Window.partitionBy(col("h")))
    val agg = ex
      .withColumn("first_doc", firstDoc)
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_sh"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("seen"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_shingles"),
        coalesce(col("seen"), lit(0L)).as("n_seen"))
      .withColumn("novel_bp",
        expr("(n_shingles - n_seen) * 10000 DIV greatest(n_shingles, 1)"))
      .orderBy(col("doc_id"))
  }

  val corpusNoveltySql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 5
      |    THEN list_transform(range(1, len(t) - 3),
      |      i -> array_to_string(t[i:i+4], ' '))
      |    ELSE [] END) AS sh
      |  FROM toks
      |), ex AS (
      |  SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d
      |), f AS (
      |  SELECT doc_id, n, min(doc_id) OVER (PARTITION BY s) AS first_doc
      |  FROM ex
      |), agg AS (
      |  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_sh,
      |    CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS seen
      |  FROM f GROUP BY 1
      |)
      |SELECT doc.doc_id,
      |  coalesce(a.n_sh, 0) AS n_shingles,
      |  coalesce(a.seen, 0) AS n_seen,
      |  CAST((coalesce(a.n_sh, 0) - coalesce(a.seen, 0)) * 10000
      |    // greatest(coalesce(a.n_sh, 0), 1) AS BIGINT) AS novel_bp
      |FROM documents doc LEFT JOIN agg a ON doc.doc_id = a.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_novelty"         -> (corpusNovelty _),
    "text_script_mix"        -> (textScriptMix _),
    "corpus_vocab_coverage"  -> (corpusVocabCoverage _),
    "corpus_datacard"        -> (corpusDatacard _),
    "corpus_curation_matrix" -> (corpusCurationMatrix _),
    "corpus_cluster_topics" -> (corpusClusterTopics _),
    "corpus_cluster_topics_oracle" -> (corpusClusterTopicsOracle _),
    "corpus_cell_topics"   -> (corpusCellTopics _),
    "corpus_gopher_filter" -> (corpusGopherFilter _),
    "text_ttr"             -> (textTtr _),
    "text_code_detect"     -> (textCodeDetect _),
    "text_markup_detect"   -> (textMarkupDetect _),
    "text_entropy"      -> (textEntropy _),
    "corpus_tfidf_topk" -> (corpusTfidfTopk _),
    "corpus_bm25"       -> (corpusBm25 _),
    "corpus_curate"     -> (corpusCurate _),
    "corpus_pmi_topk"   -> (corpusPmiTopk _),
    "text_memorization" -> (textMemorization _),
    "corpus_ppl_bucket" -> (corpusPplBucket _),
    "text_winnow"       -> (textWinnow _))

  val oracle: Map[String, String] = Map(
    "corpus_novelty"         -> corpusNoveltySql,
    "text_script_mix"        -> textScriptMixSql,
    "corpus_vocab_coverage"  -> corpusVocabCoverageSql,
    "corpus_datacard"        -> corpusDatacardSql,
    "corpus_curation_matrix" -> corpusCurationMatrixSql,
    "corpus_cell_topics"   -> corpusCellTopicsSql,
    "corpus_cluster_topics_oracle" -> corpusClusterTopicsOracleSql,
    "corpus_gopher_filter" -> corpusGopherFilterSql,
    "text_ttr"             -> textTtrSql,
    "text_code_detect"     -> textCodeDetectSql,
    "text_markup_detect"   -> textMarkupDetectSql,
    "text_entropy"      -> textEntropySql,
    "corpus_tfidf_topk" -> corpusTfidfTopkSql,
    "corpus_bm25"       -> corpusBm25Sql,
    "corpus_curate"     -> corpusCurateSql,
    "corpus_pmi_topk"   -> corpusPmiTopkSql,
    "text_memorization" -> textMemorizationSql,
    "corpus_ppl_bucket" -> corpusPplBucketSql,
    "text_winnow"       -> textWinnowSql)
}
