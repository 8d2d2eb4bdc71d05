package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The corpus_split/sample/mix/pack id hash must survive snowflake-scale
  * 64-bit doc_ids: the former raw `doc_id * 2654435761` multiply ANSI-aborts
  * at doc_id ≈ 3.47e9, i.e. on row one of a real 100 TB corpus. The mod-p
  * ladder reduces first, so every non-negative long id hashes without
  * exception — pinned here end-to-end through all four operators AND
  * against an exact BigInt reference of the arithmetic. */
class WideIdSpec extends SparkSpecBase {
  import spark.implicits._

  private val P = 1000000007L
  private val A = 2654435761L
  private val B = 97531L

  private val wideIds = Seq(
    0L, 1L, 3469999999L, 3470000001L, // around the old overflow bound
    1000000000000000000L,             // 10^18 (the verdict's pin)
    Long.MaxValue)

  test("idHash evaluates at 10^18 and Long.MaxValue, matching BigInt reference") {
    val got = wideIds.toDF("id")
      .select(col("id"), TextAnalysis.idHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- wideIds) {
      val expect = ((BigInt(A) * (BigInt(id) mod BigInt(P)) + B) mod BigInt(P)).toLong
      assert(got(id) == expect, s"idHash($id)")
      assert(got(id) >= 0 && got(id) < P)
    }
  }

  test("split/sample/mix/pack run on a corpus with 10^18-scale doc_ids") {
    val dir = Files.createTempDirectory("graft-wideid").toString
    // ids spread across the wide range, including beyond the old bound
    val base = 999999999999999000L // near 10^18
    spark.range(0, 200)
      .select(
        (col("id") + base).as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("fr").as("lang"),
        when(col("id") % 3 === 0, "web").otherwise("books").as("source"),
        concat(lit("some document text body number "), col("id")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val splits = TextAnalysis.corpusSplit(spark, dir).collect()
    assert(splits.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(splits.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    val sampled = TextAnalysis.corpusSample(spark, dir).collect()
    assert(sampled.map(_.getAs[Long]("n_docs")).sum == 200L)
    val mixed = TextAnalysis.corpusMix(spark, dir).collect()
    assert(mixed.map(_.getAs[Long]("n_docs")).sum == 200L)
    val packed = TextAnalysis.corpusPack(spark, dir)
    assert(packed.count() == 200L)
    assert(packed.agg(max(col("shard"))).head().getLong(0) < 64L)
  }

  test("sketch mixedIdHash survives Long.MaxValue, matching BigInt reference") {
    // mix(h) = (h²·31 + h) mod p over h = idHash(id) < p ≈ 2³⁰ — h² < 2⁶⁰
    // never overflows, for ANY long id (the wau-sketch register path)
    val got = wideIds.toDF("id")
      .select(col("id"), graft.operators.Sketches.mixedIdHash(col("id")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- wideIds) {
      val h = (BigInt(A) * (BigInt(id) mod BigInt(P)) + B) mod BigInt(P)
      val expect = ((h * h mod BigInt(P)) * 31 + h mod BigInt(P)).mod(BigInt(P)).toLong
      assert(got(id) == expect, s"mixedIdHash($id): ${got(id)} vs $expect")
      assert(got(id) >= 0 && got(id) < P)
    }
  }
}
