package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators over `documents`: exact (hash groupBy), n-gram
  * Jaccard (blocked pair verification), MinHash+LSH banding, SimHash with
  * hamming banding. All composed from codegen'd array/lambda expressions —
  * no UDFs — so minhash signatures etc. stay inside whole-stage codegen.
  *
  * Scale notes: exact and minhash/simhash are shuffle-by-hash-key (linear);
  * n-gram Jaccard bounds its O(n²) verification to within (lang, source)
  * blocks; LSH bounds candidate generation to within band buckets.
  */
object Dedup {

  /** Word tokens, lowercased alnum runs. */
  private def toks(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Word 3-gram shingles (empty when < 3 tokens). */
  private def shingles(c: Column): Column = {
    val ws = toks(c)
    when(size(ws) >= 3,
      transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", slice(ws, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: md5 groupBy, keep the smallest doc_id of each clone set. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** N-gram (word 3-gram) Jaccard near-dup pairs, blocked by (lang, source).
    * Jaccard over distinct shingle sets; pairs above 0.2 are emitted. */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(shingles(col("text"))).as("sh"))
    val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "source"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"), 4))
      .filter(col("jaccard") > 0.2)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupNgramSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3
      |      THEN list_transform(
      |        range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1),
      |        i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[i:i+2], ' '))
      |      ELSE [] END) AS sh
      |  FROM documents
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1)::DOUBLE, 4) AS jaccard
      |FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1)::DOUBLE, 4) > 0.2
      |ORDER BY 1, 2""".stripMargin

  private val NumPerms = 64
  private val Bands    = 16 // 16 bands × 4 rows

  /** MinHash signatures (64 perms via seeded xxhash64) as one array column. */
  private def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(NumPerms - 1)),
      i => aggregate(sh, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(concat(s, lit("#"), i.cast("string"))))))

  /** MinHash + LSH banding: candidate near-dup pairs sharing ≥1 of 16 bands
    * (4 minhashes per band). Returns (id_a, id_b, n_shared_bands). */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), minhashSig(array_distinct(shingles(col("text")))).as("sig"))
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(NumPerms / Bands) + 1, lit(NumPerms / Bands)))))
        ).as(Seq("band_id", "band_hash")))
    val l = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val r = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash 64-bit fingerprints + 4×16-bit-band blocking; emits candidate
    * pairs with exact hamming distance ≤ 6. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("ws"))
      .withColumn("hashes", expr("transform(ws, t -> xxhash64(t))"))
      .withColumn("bitsum", expr(
        """aggregate(hashes,
          |  transform(sequence(0, 63), b -> 0L),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (a, b) -> a + CASE WHEN (shiftright(h, b) & 1L) = 1L THEN 1L ELSE -1L END))""".stripMargin))
      .withColumn("simhash", expr(
        "aggregate(zip_with(bitsum, sequence(0, 63), (v, b) -> CASE WHEN v > 0L THEN shiftleft(1L, b) ELSE 0L END), 0L, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("simhash"))
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535L)"))
        .as(Seq("band_id", "band_val")))
    val l = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val r = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"   -> (dedupExact _),
    "dedup_ngram"   -> (dedupNgram _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _))

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram" -> dedupNgramSql)
}
