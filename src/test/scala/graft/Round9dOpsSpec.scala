package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Growth, TextAnalysis}

/** Round-9d depth ops: n-gram novelty and sample-ratio-mismatch. */
class Round9dOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, "en", "web", text)

  test("corpus_novelty: exact duplicate of an earlier doc scores 0 novel") {
    val base = (0 until 20).map(i => s"w${i * 7 % 19}alpha$i").mkString(" ")
    val fresh = (0 until 20).map(i => s"z${i}brandnew$i").mkString(" ")
    val half = base.split(" ").take(12).mkString(" ") + " " +
      (0 until 8).map(i => s"q${i}tail$i").mkString(" ")
    val out = CorpusStats.corpusNoveltyOf(Seq(
        doc(1L, base), doc(2L, base), doc(3L, fresh), doc(4L, half),
        doc(5L, "too short"))
      .toDF("doc_id", "lang", "source", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("novel_bp"))).toMap
    val (n1, seen1, bp1) = out(1L)
    assert(n1 == 16L && seen1 == 0L && bp1 == 10000L,
      s"first occurrence is fully novel: ${out(1L)}")
    assert(out(2L) == ((16L, 16L, 0L)), s"exact dup sees everything: ${out(2L)}")
    assert(out(3L)._3 == 10000L, "disjoint text is fully novel")
    // half doc: first 12 words of base → 8 shingles seen, tail novel
    val (n4, seen4, bp4) = out(4L)
    assert(n4 == 16L && seen4 == 8L && bp4 == 5000L, s"half-overlap: ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0L)), "sub-5-gram doc has no shingles")
  }

  test("corpus_novelty: ordering is by doc_id — earlier ids never blamed") {
    // same text, ids reversed relative to insertion order: only the LARGER
    // id is marked seen, regardless of row order in the input
    val t = (0 until 10).map(i => s"rev${i}tok$i").mkString(" ")
    val out = CorpusStats.corpusNoveltyOf(
        Seq(doc(9L, t), doc(2L, t)).toDF("doc_id", "lang", "source", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("novel_bp")).toMap
    assert(out(2L) == 10000L && out(9L) == 0L, out.toString)
  }

  test("events_ab_srm: exact statistic, healthy split silent, bias fires") {
    val baseTs = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    // user ids 0..399, one event each; arms derive from idHash so compute
    // the expected counts with the same hash
    val ev = (0L until 400L).map(u => (u, baseTs, u, "view", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Growth.eventsAbSrmOf(ev).collect()
      .map(r => r.getAs[String]("assignment") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("srm_stat_e4"), r.getAs[Long]("srm_flag"))).toMap
    val hashes = (0L until 400L).toDF("user_id")
      .select(TextAnalysis.idHash(col("user_id"))).collect().map(_.getLong(0)).toSeq
    def expect(armA: Long => Boolean) = {
      val a = hashes.count(h => armA(h)).toLong
      val b = 400L - a
      val d = a - b
      val stat = (d * d / 400L) * 10000L + (d * d % 400L) * 10000L / 400L
      (a, b, stat, if (stat > 38414L) 1L else 0L)
    }
    assert(out("hash_mod2") == expect(h => h % 2 == 0), out.toString)
    assert(out("skewed_5_16") == expect(h => h % 16 < 5), out.toString)
    assert(out("hash_mod2")._4 == 0L, "healthy split must not flag")
    assert(out("skewed_5_16")._4 == 1L,
      s"5/16 bias over 400 users must clear the critical value: $out")
  }

  test("events_ab_srm: statistic algebra matches the unsplit division") {
    // split long division == floor(d²·1e4 / n) for adversarial d, n
    for ((d, n) <- Seq((0L, 10L), (1L, 3L), (-7L, 13L), (999L, 1000L),
        (123456789L, 987654321L))) {
      val split = (d * d / n) * 10000L + (d * d % n) * 10000L / n
      val whole = (BigInt(d) * d * 10000 / n).toLong
      assert(split == whole, s"d=$d n=$n: $split != $whole")
    }
  }
}
