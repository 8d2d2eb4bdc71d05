package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed BPE tokenizer training + application (Sennrich et al.,
  * ACL 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the last famous LLM-pipeline compute: everything else sizes
  * or samples a corpus; this LEARNS the tokenizer the token budgets are
  * denominated in.
  *
  * Scale shape (the 100 TB form):
  *  - learning runs at the word-TYPE grain — the corpus collapses to a
  *    (word, freq) vocabulary ONCE (one exchange), and every merge round
  *    after that touches vocabulary-sized data only (×10⁴–10⁶ smaller
  *    than the corpus; the standard trick that makes BPE training
  *    corpus-size-independent);
  *  - the corpus feeding that vocabulary is HASH-SAMPLED by doc id
  *    (engine-portable [[TextAnalysis.idHash]], 3-of-4 at the gate) —
  *    at 100 TB a tokenizer trains on a sample by construction;
  *  - each merge round is ONE adjacent-pair count aggregate at
  *    (word-type, position) grain + a 1-row argmax to the driver (the
  *    Lloyd-centroid traffic class) + a map-side `replace`; rounds
  *    localCheckpoint so N rounds never replan an N-deep lineage;
  *  - applying the learned table to the corpus is a pure per-doc
  *    expression chain (encode + N string replaces) — no shuffle, no
  *    join: the merges ride the plan as literals.
  *
  * Symbols are encoded as `|sym~` runs inside a flat string (e.g. "hello"
  * → "|h~|e~|l~|l~|o~"), which makes one merge = one plain left-to-right
  * `replace(s, "|a~|b~", "|ab~")`: the leading `|` anchors each symbol's
  * START so a pair pattern can never straddle a symbol boundary (the
  * classic " a b " space-join form mis-merges "al|l" on pair (l,l)), the
  * trailing `~` makes symbols prefix-free (pair (a,b) cannot eat the
  * head of symbol "bc"), and left-to-right non-overlapping replacement
  * IS BPE's merge order within a word ("aaaa" + (a,a) → [aa][aa]).
  * Both engines share the encoding, so the 16-round learning itself is
  * hash-gated: the DuckDB oracle RE-LEARNS the merges independently
  * through 16 chained CTE layers (pair-count → argmax → replace) —
  * not a VALUES literal of Spark's answer.
  *
  * The alphabet is [a-z] (lower-cased letters; everything else is a word
  * boundary), counts are exact BIGINTs, and the argmax tie-breaks
  * (count DESC, left, right) — fully deterministic in both engines.
  * Pair counting counts every adjacent POSITION (overlaps included),
  * faithful to the reference implementation's get_stats. */
object Bpe {

  /** Merge rounds learned/applied at the gate. */
  val NMerges = 16

  /** Gate sample: keep doc ids with idHash%4 ∈ {0,1,2} — exercises the
    * hash-sampled training path the 100 TB form requires. */
  private val SampleMod = 4
  private val SampleKeep = 3

  private def samplePred: Column =
    TextAnalysis.idHash(col("doc_id")) % SampleMod < SampleKeep
  private def samplePredSql: String =
    s"(${TextAnalysis.idHashSql("doc_id")}) % $SampleMod < $SampleKeep"

  /** Encode a lower-case-letters string as `|c~` symbol runs. */
  private def encodeChars(c: Column): Column =
    regexp_replace(c, "([a-z])", "|$1~")

  /** Learned merge table for a corpus: (rank, left, right, pair_count),
    * cached per corpus CONTENT (fingerprint, not path — the quantizer
    * staleness discipline). */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, String, Long)]]

  private def docsFingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.listStatus(p).map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
    dir + "@" + java.util.Arrays.hashCode(st.asInstanceOf[Array[AnyRef]]).toString
  }

  def learnedMerges(spark: SparkSession, dir: String): Seq[(String, String, Long)] =
    mergeCache.getOrElseUpdate(docsFingerprint(spark, dir),
      learnMerges(Tables.documents(spark, dir).filter(samplePred), NMerges))

  /** The merge-learning loop over any (doc_id, text) frame. Word-type
    * grain throughout; each round collects exactly ONE row. */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    var words = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(encodeChars(col("word")).as("s"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = words
        .select(col("freq"),
          split(expr("substring(s, 2, length(s) - 2)"), "~\\|").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
        .select(element_at(col("syms"), col("i")).as("l"),
          element_at(col("syms"), col("i") + 1).as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // corpus merged to single symbols
      else {
        val l = top.head.getString(0); val r = top.head.getString(1)
        merges += ((l, r, top.head.getLong(2)))
        words = words
          .withColumn("s", replace(col("s"), lit(s"|$l~|$r~"), lit(s"|$l$r~")))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Gate: the learned merge table itself, one row per round. */
  def corpusBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    learnedMerges(spark, dir).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("merge_rank", "lsym", "rsym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** Gate: the corpus tokenized under the learned table — per doc the
    * letter count and the post-merge BPE token count (the compression
    * the tokenizer actually bought). Pure map-side expression chain. */
  def corpusBpeApply(spark: SparkSession, dir: String): DataFrame =
    corpusBpeApplyOf(Tables.documents(spark, dir), learnedMerges(spark, dir))

  /** The doc's text encoded + all merges applied, as one expression —
    * letters-only stream: non-letters become word boundaries, and a
    * literal '|'/'~' in the raw text can neither corrupt a merge nor
    * inflate the token count. */
  private def appliedCol(merges: Seq[(String, String, Long)]): Column = {
    val lettersOnly = regexp_replace(lower(col("text")), "[^a-z]", " ")
    merges.foldLeft(encodeChars(lettersOnly)) { case (s, (l, r, _)) =>
      replace(s, lit(s"|$l~|$r~"), lit(s"|$l$r~"))
    }
  }

  def corpusBpeApplyOf(docs: DataFrame, merges: Seq[(String, String, Long)]): DataFrame = {
    val applied = appliedCol(merges)
    docs.select(col("doc_id"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long").as("n_chars"),
        (length(applied) - length(replace(applied, lit("|"), lit("")))).cast("long")
          .as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** How many vocabulary entries [[corpusBpeVocab]] reports. */
  val VocabTopK = 64

  /** Gate: the corpus vocabulary UNDER the learned tokenizer — the
    * top-[[VocabTopK]] symbols by occurrence after all merges apply
    * (rank, symbol, occurrence count). This is the table a tokenizer
    * release ships beside its merge list, and the statistic
    * `corpus_vocab_coverage` sizes budgets against, now at SUBWORD
    * grain. Plan: the apply chain is the same map-side expression as
    * [[corpusBpeApply]]; symbols explode once and collapse on the
    * symbol exchange (partial-aggregated), so the only wide ops are one
    * combine-heavy count and the final top-K sort of a vocabulary-sized
    * table. Deterministic ties (count DESC, symbol). */
  def corpusBpeVocab(spark: SparkSession, dir: String): DataFrame =
    corpusBpeVocabOf(Tables.documents(spark, dir), learnedMerges(spark, dir))

  def corpusBpeVocabOf(docs: DataFrame, merges: Seq[(String, String, Long)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc, col("symbol"))
    docs
      .select(explode(
        // extract each |sym~ run's group-1; the applied string contains
        // only [a-z], ' ', '|', '~', so the class is exact
        regexp_extract_all(appliedCol(merges), lit("\\|([a-z]+)~"), lit(1)))
        .as("symbol"))
      .groupBy(col("symbol")).agg(count(lit(1)).as("n_tokens"))
      // vocabulary-sized input: the single-partition rank window is the
      // final top-K presentation sort, not a corpus-scale operation
      .withColumn("vrank", row_number().over(w))
      .filter(col("vrank") <= VocabTopK)
      .select(col("vrank").cast("long").as("vrank"), col("symbol"),
        col("n_tokens").cast("long").as("n_tokens"))
      .orderBy(col("vrank"))
  }

  /** Gate: tokenizer FERTILITY per language — tokens-per-word under the
    * learned merge table (×100, truncating DIV), the standard
    * tokenizer-evaluation statistic (a tokenizer trained on one language
    * mix "spends" more subwords per word on under-represented
    * languages; this table is how that bias is measured and reported).
    * Here the training sample is hash-drawn from the whole corpus, so
    * the gate shows the per-language spread of one shared tokenizer.
    * Same map-side apply chain; one lang-grain aggregate. */
  def corpusTokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    corpusTokenizerFertilityOf(Tables.documents(spark, dir), learnedMerges(spark, dir))

  def corpusTokenizerFertilityOf(docs: DataFrame,
                                 merges: Seq[(String, String, Long)]): DataFrame = {
    val applied = appliedCol(merges)
    docs
      .select(col("lang"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long").as("nw"),
        (length(applied) - length(replace(applied, lit("|"), lit("")))).cast("long").as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"), sum(col("nt")).as("n_tokens"))
      .withColumn("fert_e2",
        expr("n_tokens * 100 DIV greatest(n_words, 1)"))
      .orderBy(col("lang"))
  }

  val corpusTokenizerFertilitySql: String =
    s"""WITH ${learnCtesSql(NMerges)},
       |$applyCtesSql,
       |d AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS nw,
       |    lang
       |  FROM documents
       |), j AS (
       |  SELECT d.lang, d.nw,
       |    CAST(length(ap.s) - length(replace(ap.s, '|', '')) AS BIGINT) AS nt
       |  FROM d JOIN ap ON d.doc_id = ap.doc_id
       |)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nw) AS BIGINT) AS n_words,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(nt) * 100 // greatest(sum(nw), 1) AS BIGINT) AS fert_e2
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- oracles

  /** The 16-round learning as chained DuckDB CTEs — an INDEPENDENT
    * re-derivation (pair-count → 1-row argmax → replace per layer), so a
    * hash match proves the whole iterative algorithm cross-engine, not
    * just a replay of Spark's output. */
  private def learnCtesSql(n: Int): String = {
    // every learning CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    // w_k is referenced twice (p_{k+1} and w_{k+1}) — inlining would
    // expand w0 2^n times (observed: fd exhaustion at n=16)
    val base =
      s"""w0 AS MATERIALIZED (
         |  SELECT regexp_replace(word, '([a-z])', '|\\1~', 'g') AS s,
         |    CAST(count(*) AS BIGINT) AS freq
         |  FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         |    FROM documents WHERE $samplePredSql
         |  ) GROUP BY 1
         |)""".stripMargin
    val rounds = (1 to n).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT syms[i + 1] AS l, syms[i + 2] AS r, CAST(sum(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, string_split(s[2:-2], '~|') AS syms FROM w${k - 1}) t,
         |       unnest(range(0, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), m$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      '|' || (SELECT l FROM m$k) || '~|' || (SELECT r FROM m$k) || '~',
         |      '|' || (SELECT l FROM m$k) || (SELECT r FROM m$k) || '~') AS s,
         |    freq
         |  FROM w${k - 1}
         |)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  val corpusBpeMergesSql: String = {
    val union = (1 to NMerges)
      .map(k => s"SELECT ${k}::BIGINT AS merge_rank, l AS lsym, r AS rsym, c AS pair_count FROM m$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${learnCtesSql(NMerges)}
       |SELECT * FROM (
       |  $union
       |) ORDER BY merge_rank""".stripMargin
  }

  /** The encode + full apply chain as SQL CTEs (enc → ap), shared by the
    * apply and vocab oracles. */
  private def applyCtesSql: String = {
    val applied = (1 to NMerges).foldLeft("s") { (inner, k) =>
      s"replace($inner, '|' || (SELECT l FROM m$k) || '~|' || (SELECT r FROM m$k) || '~', " +
        s"'|' || (SELECT l FROM m$k) || (SELECT r FROM m$k) || '~')"
    }
    s"""enc AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(lower(text), '[^a-z]', ' ', 'g'),
       |      '([a-z])', '|\\1~', 'g') AS s,
       |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT)
       |      AS n_chars
       |  FROM documents
       |),
       |ap AS (SELECT doc_id, n_chars, $applied AS s FROM enc)""".stripMargin
  }

  val corpusBpeApplySql: String =
    s"""WITH ${learnCtesSql(NMerges)},
       |$applyCtesSql
       |SELECT doc_id, n_chars,
       |  CAST(length(s) - length(replace(s, '|', '')) AS BIGINT) AS n_tokens
       |FROM ap ORDER BY doc_id""".stripMargin

  val corpusBpeVocabSql: String =
    s"""WITH ${learnCtesSql(NMerges)},
       |$applyCtesSql,
       |sym AS (
       |  SELECT unnest(regexp_extract_all(s, '\\|([a-z]+)~', 1)) AS symbol
       |  FROM ap
       |), counts AS (
       |  SELECT symbol, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM sym GROUP BY 1
       |)
       |SELECT CAST(row_number() OVER (ORDER BY n_tokens DESC, symbol) AS BIGINT)
       |    AS vrank, symbol, n_tokens
       |FROM counts
       |ORDER BY n_tokens DESC, symbol
       |LIMIT $VocabTopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_bpe_merges" -> (corpusBpeMerges _),
    "corpus_bpe_apply"  -> (corpusBpeApply _),
    "corpus_bpe_vocab"  -> (corpusBpeVocab _),
    "corpus_tokenizer_fertility" -> (corpusTokenizerFertility _))

  val oracle: Map[String, String] = Map(
    "corpus_bpe_merges" -> corpusBpeMergesSql,
    "corpus_bpe_apply"  -> corpusBpeApplySql,
    "corpus_bpe_vocab"  -> corpusBpeVocabSql,
    "corpus_tokenizer_fertility" -> corpusTokenizerFertilitySql)
}
