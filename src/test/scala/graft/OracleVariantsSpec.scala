package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, OracleVariants, Similarity}

/** Ties each production (xxhash64 / float) path to its DuckDB-provable
  * oracle twin: any detection property that holds regardless of hash family
  * must agree between the two, so the oracle's green gate row transfers
  * confidence to the production path it mirrors. */
class OracleVariantsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Corpus with exact duplicate pairs (0,1) and (2,3) plus unrelated docs:
    * identical docs collide in EVERY band under ANY hash family; the
    * unrelated docs share no shingles at all. */
  private lazy val dupDir: String = {
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, "en", "web", s"$words one two three four five six seven eight nine ten"),
      (1L, "en", "web", s"$words one two three four five six seven eight nine ten"),
      (2L, "en", "web", "completely different text about kumquats and zeppelins floating over mountains today"),
      (3L, "en", "web", "completely different text about kumquats and zeppelins floating over mountains today"),
      (4L, "en", "web", "unrelated corpus entry q7 r8 s9 t0 u1 v2 w3 x4 y5 z6 aa bb cc"))
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = Files.createTempDirectory("graft-oracle").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash: production and oracle variant agree on exact dups and non-dups") {
    val prod = pairs(Dedup.dedupMinhash(spark, dupDir))
    val orac = pairs(OracleVariants.dedupMinhashOracle(spark, dupDir))
    for (p <- Seq((0L, 1L), (2L, 3L))) {
      assert(prod.contains(p), s"production minhash must flag exact dup $p")
      assert(orac.contains(p), s"oracle minhash must flag exact dup $p")
    }
    for (p <- Seq((0L, 2L), (1L, 4L), (3L, 4L))) {
      assert(!prod.contains(p), s"production minhash must not flag unrelated $p")
      assert(!orac.contains(p), s"oracle minhash must not flag unrelated $p")
    }
    // exact dups share EVERY band in both families
    val prodBands = Dedup.dedupMinhash(spark, dupDir)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .head().getAs[Long]("n_shared_bands")
    val oracBands = OracleVariants.dedupMinhashOracle(spark, dupDir)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .head().getAs[Long]("n_shared_bands")
    assert(prodBands == 16L && oracBands == 4L)
  }

  test("simhash: exact dups have hamming 0 in both families") {
    def h0(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Int =
      df.filter(col("id_a") === a && col("id_b") === b)
        .head().getAs[Number]("hamming").intValue()
    assert(h0(Dedup.dedupSimhash(spark, dupDir), 0L, 1L) == 0)
    assert(h0(OracleVariants.dedupSimhashOracle(spark, dupDir), 0L, 1L) == 0)
    assert(h0(Dedup.dedupSimhash(spark, dupDir), 2L, 3L) == 0)
    assert(h0(OracleVariants.dedupSimhashOracle(spark, dupDir), 2L, 3L) == 0)
  }

  test("knn_brute: quantized oracle ranks agree with the float path") {
    val float = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toMap
    val quant = OracleVariants.knnBruteOracle(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toMap
    assert(float.keySet == quant.keySet)
    // ×1000 quantization perturbs cosines by O(1e-3): every matched rank's
    // cosine must agree to that tolerance, and the top-1 neighbor must match
    // exactly unless the float gap itself is inside the quantization noise
    var top1Agree = 0
    for (q <- 0L until 10L) {
      val (fn, fc) = float((q, 1)); val (qn, qc) = quant((q, 1))
      assert(math.abs(fc - qc) < 5e-3)
      if (fn == qn) top1Agree += 1
    }
    assert(top1Agree >= 8, s"top-1 neighbors should survive quantization, got $top1Agree/10")
  }

  test("dedup_embed sub-blocks oversized label blocks (guard differential)") {
    // one degenerate label of 60 near-identical vectors (every pair clears
    // the 0.35 threshold): with cap 10 the guard must emit EXACTLY the
    // pairs whose engine-portable sub-block hashes agree — checked against
    // an independent BigInt reference of the sub assignment — and with the
    // cap above the block size it must be a no-op (all pairs)
    val n = 60
    val rows = (0 until n).map { i =>
      (i.toLong, 0L,
        (0 until 8).map(j => 1.0f + (if (j == i % 8) 0.01f * (i / 8 + 1) else 0.0f)))
    }
    val emb = rows.toDF("vec_id", "label", "embedding")
    val guarded = pairs(Similarity.dedupEmbedOf(emb, maxBlock = 10L))
    val P = 1000000007L; val A = 2654435761L; val B = 97531L
    def sub(id: Long) = ((A * (id % P) + B) % P) % 6L // nsub = floor(59/10)+1
    val expected = (for {
      a <- 0 until n; b <- a + 1 until n; if sub(a) == sub(b)
    } yield (a.toLong, b.toLong)).toSet
    assert(guarded == expected)
    assert(guarded.nonEmpty && guarded.size < n * (n - 1) / 2)
    // below the cap the guard is a no-op: every pair survives
    val plain = pairs(Similarity.dedupEmbedOf(emb, maxBlock = 1000L))
    assert(plain == (for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)).toSet)
  }

  test("dedup_embed: quantized oracle finds the same near-dup pairs") {
    val prod = pairs(Similarity.dedupEmbed(spark, sfDir))
    val orac = pairs(OracleVariants.dedupEmbedOracle(spark, sfDir))
    // threshold 0.35 with cosines quantized by O(1e-3): pair sets may differ
    // only for pairs within noise of the threshold
    val diff = (prod -- orac) ++ (orac -- prod)
    val prodCos = Similarity.dedupEmbed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos")).toMap
    diff.foreach { p =>
      val c = prodCos.getOrElse(p, 0.35)
      assert(math.abs(c - 0.35) < 5e-3, s"pair $p differs but cos $c is not near threshold")
    }
    assert((prod intersect orac).size >= prod.size - diff.size)
  }
}
