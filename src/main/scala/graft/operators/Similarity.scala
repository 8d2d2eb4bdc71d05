package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float], 64-dim):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the approximate scale path, and embedding-cosine near-dup
  * pairs with label blocking.
  *
  * Cosines run through graft's native `cosine_similarity` Catalyst
  * expression (one fused codegen'd loop, float arrays read in place);
  * hyperplane projections use `zip_with`+`aggregate` column expressions.
  *
  * Scale: brute-force is O(Q×N) with Q broadcast — correct baseline, not the
  * 100 TB path. The LSH variant buckets candidates by hyperplane sign code so
  * each query only scans its bucket; at cluster scale the bucketed join
  * shuffles by bucket id (uniform, small fan-in) instead of replicating N.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine via graft's native Catalyst expression (GraftExtensions must be
    * installed): one fused codegen'd loop for dot + both norms — no
    * intermediate zip_with array per row pair. */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  private val K = 5

  /** Brute-force cosine top-k (excluding self) for query vectors vec_id<10. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qvec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes (LCG on (plane, dim)). */
  private def planes(dim: Int): Seq[Seq[Double]] =
    (0 until NumPlanes).map { p =>
      (0 until dim).map { d =>
        val x = (p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
        (x % 2001L).toDouble / 1000.0 - 1.0
      }
    }

  private def bucketOf(vec: Column, dim: Int): Column = {
    val ps = planes(dim)
    (0 until NumPlanes).map { p =>
      val plane = typedLit(ps(p))
      when(dot(vec, plane) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: same output shape as knnBrute but each
    * query only scans its hyperplane-sign bucket (may return < K rows). */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", bucketOf(asDouble(col("embedding")), 64))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = emb.select(col("bucket"), col("vec_id").as("neighbor_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.join(broadcast(queries), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qvec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style approximate top-k: a training-free coarse quantizer (first 16
    * vectors act as centroids), every vector assigned to its nearest
    * centroid cell, queries probe their 2 nearest cells. The cluster-scale
    * shape: candidates shuffle once by cell id; queries × cells is tiny and
    * broadcast. (A learned k-means quantizer would only change how `cents`
    * is produced.) */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    def nearestCells(df: DataFrame, vecCol: String, n: Int, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("csim", cosine(col(vecCol), col("cvec")))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= n)
        .select(df.columns.toIndexedSeq.map(col) :+ col("cent_id").as(out): _*)
    }
    val cands = nearestCells(emb, "embedding", 1, "cell")
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding"))
    val queries = nearestCells(emb.filter(col("vec_id") < 10), "embedding", 2, "cell")
      .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.join(broadcast(queries), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qvec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (cos > 0.35), candidate pairs
    * blocked by the coarse cluster label. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val a = emb.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = emb.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cos") > 0.35)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute"   -> (knnBrute _),
    "knn_lsh"     -> (knnLsh _),
    "knn_ivf"     -> (knnIvf _),
    "dedup_embed" -> (dedupEmbed _))

  /** Float-vector math: deliberately rows-only (summation-order ulps make
    * cross-engine hash equality meaningless). */
  val oracle: Map[String, String] = Map.empty
}
