package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Two-phase exact heavy hitters: brute-force differentials on skewed
  * corpora, the pigeonhole superset lemma under adversarial geometries,
  * and the candidate-volume bound that makes phase 2 broadcastable. */
class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  /** Zipf-ish token stream: token i drawn with weight ∝ 1/(i+1). */
  private def zipfToks(n: Int, vocab: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val cum = (0 until vocab).map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _).tail.toArray
    val z = cum.last
    (0 until n).map { _ =>
      val j = java.util.Arrays.binarySearch(cum, rnd.nextDouble() * z)
      s"w${if (j >= 0) j else -j - 1}"
    }.toDF("gram")
  }

  private def brute(toks: org.apache.spark.sql.DataFrame, k: Int) =
    toks.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .crossJoin(toks.agg(count(lit(1)).as("nt")))
      .filter(col("n") * k >= col("nt"))
      .select(col("gram"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def hh(toks: org.apache.spark.sql.DataFrame, k: Int) =
    HeavyHitters.heavyHittersOf(toks, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("differential vs brute force on Zipf corpora, several k") {
    for ((seed, k) <- Seq((1, 50), (2, 200), (3, 1000))) {
      val toks = zipfToks(20000, 5000, seed).repartition(8)
      val expected = brute(toks, k)
      assert(expected.nonEmpty, "fixture must contain heavy hitters")
      assert(hh(toks, k) == expected,
        s"seed=$seed k=$k: two-phase output must equal the global answer")
    }
  }

  test("a hot token spread EVENLY across partitions is still caught") {
    // the geometry the pigeonhole argument covers: globally heavy but in
    // no partition unusually so — share is just above 1/k everywhere
    val k = 100
    val bg = (0 until 9900).map(i => s"bg$i")
    val hot = Seq.fill(100)("hot")
    // interleave so round-robin repartition spreads `hot` uniformly
    val toks = (bg.grouped(99).toSeq zip hot.map(Seq(_)))
      .flatMap { case (a, b) => a ++ b }.toDF("gram").repartition(10)
    val out = hh(toks, k)
    assert(out == Map("hot" -> 100L),
      s"evenly-spread hot token must survive pruning, got $out")
  }

  test("locally-heavy but globally-light tokens are pruned by the exact pass") {
    val k = 100
    // `spike` is 30% of one tiny partition but 0.5% of the corpus
    val spikePart = Seq.fill(30)("spike") ++ (0 until 70).map(i => s"p$i")
    val rest = (0 until 5900).map(i => s"r${i % 2950}")
    val toks = spikePart.toDF("gram").repartition(1)
      .unionByName(rest.toDF("gram").repartition(7))
    val out = hh(toks, k)
    // every token is globally light (spike 0.5%, rest ≤2 occurrences each
    // vs the 1% threshold), so the exact pass must return nothing at all
    assert(out.isEmpty,
      s"phase-2 exact recount must drop local spikes, got $out")
  }

  test("gram domain: planted boilerplate trigram found over a huge domain") {
    val rnd = new scala.util.Random(7)
    // 400 docs of 40 random words; every 8th carries a planted boilerplate
    // sentence — 50 occurrences vs a ~39-occurrence 1/k threshold
    val docs = (0 until 400).map { i =>
      val words = (0 until 40).map(_ => s"t${rnd.nextInt(20000)}")
      val text = if (i % 8 == 0) "all rights reserved " + words.mkString(" ")
                 else words.mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val tris = docs.select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "w")))
      .withColumn("gram", when(lead(col("w"), 2).over(w).isNotNull,
        concat_ws(" ", col("w"), lead(col("w"), 1).over(w), lead(col("w"), 2).over(w))))
      .filter(col("gram").isNotNull).select(col("gram")).repartition(8)
    val k = 400
    assert(hh(tris, k) == brute(tris, k))
    assert(hh(tris, k).contains("all rights reserved"))
  }

  test("candidate volume is bounded by partitions x k") {
    val toks = zipfToks(30000, 8000, seed = 9).repartition(6)
    val k = 64
    val nCands = HeavyHitters.mgCandidates(toks.select(col("gram")).as[String], k).count()
    assert(nCands <= 6L * k, s"$nCands candidates exceed the 6x$k bound")
    // and the candidate set is a superset of the true heavy hitters
    val cands = HeavyHitters.mgCandidates(toks.select(col("gram")).as[String], k)
      .collect().map(_.getString(0)).toSet
    assert(brute(toks, k).keySet.subsetOf(cands))
  }

  test("gate query on the test corpus matches k=1000 and is non-empty") {
    val out = HeavyHitters.corpusHeavyHitters(spark, sfDir).collect()
    assert(out.length > 5, s"expected a stable stopword census, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Long]("share_bp") >= 10,
        s"1/1000 share floor in bp: ${r.mkString(",")}")
    }
  }
}
