package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins for the MMR diversified top-k: the diversity property it exists
  * for (a duplicate cluster must not fill the result), and an independent
  * driver-side greedy replay at a gate corpus (the DuckDB oracle replays
  * the same unrolled rounds cross-engine; this replay checks the Spark
  * plan against straight-line Scala). */
class KnnMmrSpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"

  /** Query 0 = e0. Duplicate cluster A (ids 10-12) at rel ~0.9 with mutual
    * sim ~0.999; diversity pick B (id 13) at rel 0.85 but far from A
    * (sim(B, A) ~ 0.765). Plain top-2 would take two A members; MMR round
    * 2 scores A2 at 9000 − 9990 < 0 vs B at 8500 − 7650 > 0. Fillers keep
    * the shortlist populated without competing for ranks 1-2. */
  private lazy val divDir: String = {
    val dim = 64
    def unit(parts: (Int, Double)*): Seq[Float] = {
      val v = Array.fill(dim)(0.0)
      parts.foreach { case (d, x) => v(d) = x }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val rows =
      Seq((0L, unit(0 -> 1.0), 0)) ++                     // the query
      (1 to 9).map(i => (i.toLong, unit(0 -> 0.2, (i + 20) -> 0.98), 1)) ++
      Seq(
        (10L, unit(0 -> 0.91, 1 -> 0.415), 2),           // A1 (best rel)
        (11L, unit(0 -> 0.90, 1 -> 0.435, 2 -> 0.02), 2), // A2
        (12L, unit(0 -> 0.90, 1 -> 0.435, 3 -> 0.02), 2), // A3
        (13L, unit(0 -> 0.85, 4 -> 0.527), 3),           // B — the diverse pick
        (14L, unit(0 -> 0.25, 30 -> 0.97), 4),
        (15L, unit(0 -> 0.25, 31 -> 0.97), 4))
    val dir = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("duplicate cluster does not fill the result: rank 2 is the diverse pick") {
    val out = Similarity.knnMmr(spark, divDir)
      .filter(col("query_id") === 0L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.length == 5)
    assert(out(0) == (1L, 10L), s"rank 1 must be the most relevant (A1), got ${out(0)}")
    assert(out(1) == (2L, 13L),
      s"rank 2 must be the diverse pick B, not an A duplicate, got ${out(1)}")
    // a plain top-2 on the same corpus WOULD take a second A member —
    // the property that distinguishes MMR from the rank window
    val plain = Similarity.knnBrute(spark, divDir)
      .filter(col("query_id") === 0L && col("rank") === 2)
      .collect().map(_.getLong(2))
    assert(plain.headOption.exists(Set(11L, 12L)),
      s"corpus no longer makes plain top-2 pick a duplicate (${plain.toSeq}) — pin weakened")
  }

  test("operator output equals a driver-side greedy replay at sf0.01") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val quant = (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * 1000).cast("long"))
    val e4 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(call_function("quantized_cosine", a, b) * 10000).cast("long")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), quant(col("embedding")).as("qv"))
    val rel = emb.select(col("vec_id").as("nid"), quant(col("embedding")).as("cv"))
      .crossJoin(broadcast(q)).filter(col("nid") =!= col("qid"))
      .withColumn("rel", e4(col("cv"), col("qv")))
      .select("qid", "nid", "rel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = emb.select(col("vec_id"), quant(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    def simE4(a: Long, b: Long): Long = {
      val (va, vb) = (vecs(a), vecs(b))
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < va.length) { dot += va(i)*vb(i); na += va(i)*va(i); nb += vb(i)*vb(i); i += 1 }
      math.round(dot.toDouble / math.sqrt(math.max(na.toDouble * nb.toDouble, 1.0)) * 10000)
    }
    val expected = (0L until 10L).flatMap { qid =>
      val short = rel.filter(_._1 == qid).map(t => (t._2, t._3))
        .sortBy(t => (-t._2, t._1)).take(12)
      var selected = List.empty[Long]
      var picks = List.empty[(Long, Long, Long, Long, Long)]
      for (r <- 1 to 5) {
        val cands = short.filter(t => !selected.contains(t._1)).map { case (nid, rl) =>
          val pen = if (selected.isEmpty) 0L else selected.map(s => simE4(s, nid)).max
          val score = if (selected.isEmpty) rl else rl - pen
          (score, rl, nid)
        }
        if (cands.nonEmpty) {
          val best = cands.maxBy(t => (t._1, t._2, -t._3))
          selected ::= best._3
          picks ::= ((qid, r.toLong, best._3, best._1, best._2))
        }
      }
      picks.reverse
    }
    val got = Similarity.knnMmr(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, "Spark MMR diverged from the driver-side greedy replay")
    assert(got.size == 50)
  }
}
