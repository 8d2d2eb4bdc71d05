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

  test("corpus_quality_classifier: engine training equals a reference perceptron") {
    // two vocabularies with overlap; en docs lean on one, the rest on the
    // other — separable but not trivially (shared words collide weights)
    val rnd = new scala.util.Random(31)
    def words(pool: String, n: Int) =
      (0 until 15).map(_ => s"$pool${rnd.nextInt(n)}").mkString(" ")
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "en", "web", words("good", 30) + " " + words("mid", 10))
      else (i.toLong, "de", "web", words("bad", 30) + " " + words("mid", 10))
    }
    val df = docs.toDF("doc_id", "lang", "source", "text")
    val out = graft.operators.Classifier.corpusQualityClassifierOf(df).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("k")) -> r.getAs[Long]("value"))
      .toMap

    // reference model, plain Scala: same hash, same split, same updates
    val P = 1000000007L
    def tokHash(w: String): Long =
      w.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % P)
    val idHashes = docs.map(_._1).toDF("doc_id")
      .select(col("doc_id"), TextAnalysis.idHash(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = docs.map { case (id, lang, _, text) =>
      val counts = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        .groupBy(w => (tokHash(w) % 256).toInt).view.mapValues(_.size.toLong).toMap
      (id, if (lang == "en") 1L else -1L, idHashes(id) % 4 < 3,
        counts + (256 -> 1L))
    }
    val w = Array.fill(257)(0L)
    val wAvg = Array.fill(257)(0L)
    val refMistakes = (1 to 8).map { _ =>
      val mk = feats.filter(_._3).filter { case (_, y, _, x) =>
        y * x.map { case (b, c) => c * w(b) }.sum <= 0 }
      mk.foreach { case (_, y, _, x) =>
        x.foreach { case (b, c) => w(b) += y * c } }
      (0 until 257).foreach(b => wAvg(b) += w(b))
      mk.size.toLong
    }
    (1 to 8).foreach(t => assert(out(("round_mistakes", t.toLong)) == refMistakes(t - 1),
      s"round $t mistakes: got ${out(("round_mistakes", t.toLong))} want ${refMistakes(t - 1)}"))
    (0 until 257).foreach(b => assert(out(("weight", b.toLong)) == wAvg(b),
      s"weight $b: got ${out(("weight", b.toLong))} want ${wAvg(b)}"))
    def okCount(train: Boolean) = feats.count { case (_, y, tr, x) =>
      tr == train && y * x.map { case (b, c) => c * wAvg(b) }.sum > 0 }.toLong
    assert(out(("acc", 0L)) == okCount(train = true))
    assert(out(("acc", 2L)) == okCount(train = false))
    assert(out(("acc", 3L)) > 0L, "fixture must hold out test docs")
    assert(out(("acc", 4L)) == out(("acc", 2L)) * 10000L / out(("acc", 3L)))
    // the trained model must actually separate the fixture
    assert(out(("acc", 4L)) >= 7500L,
      s"held-out accuracy too low: ${out(("acc", 4L))} bp")
  }

  test("embed_hard_negatives: exact mining on clusters; planted near-anchor negative found") {
    val rnd = new scala.util.Random(5)
    val centers = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f))
    val vecs = (0 until 60).map { i =>
      val l = i % 3
      val v = centers(l).clone()
      (0 until 8).foreach(d => v(d) += rnd.nextFloat() - 0.5f)
      (i.toLong, v.toSeq, l)
    }
    // a label-1 vector planted INSIDE cluster 0, right next to anchor ids
    val planted = (1000L, centers(0).map(x => x + 0.01f).toSeq, 1)
    val df = (vecs :+ planted).toDF("vec_id", "embedding", "label")
    val cents = centers.map(_.map(_.toDouble).toSeq)

    def cosR(a: Seq[Float], b: Seq[Float]): BigDecimal = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val all = vecs :+ planted
    val brute = all.map { case (id, v, l) =>
      id -> all.filter(o => o._3 != l)
        .maxBy(o => (cosR(v, o._2), -o._1))._1
    }.toMap

    // nprobe = 3 probes every cell: production must equal brute exactly
    val out3 = graft.operators.Similarity
      .embedHardNegativesWith(df, cents, nprobe = 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neg_id")).toMap
    assert(out3.size == all.size)
    all.foreach { case (id, _, _) =>
      assert(out3(id) == brute(id), s"anchor $id: got ${out3(id)} want ${brute(id)}") }

    // nprobe = 2: the planted negative sits in the anchors' OWN cell, so
    // the pruned search still finds it for every cluster-0 anchor whose
    // true hard negative it is
    val out2 = graft.operators.Similarity
      .embedHardNegativesWith(df, cents, nprobe = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neg_id")).toMap
    val c0 = vecs.filter(_._3 == 0).map(_._1).filter(id => brute(id) == 1000L)
    assert(c0.nonEmpty, "planted vector must be some cluster-0 anchor's hard negative")
    c0.foreach(id => assert(out2(id) == 1000L, s"anchor $id missed the planted negative"))
  }

  test("events_bot_flag: planted bots fire, organic traffic stays silent") {
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    def ev(u: Long, offsetSec: Long, id: Long) =
      (u, new java.sql.Timestamp(base + offsetSec * 1000L), id, "view", 1.0)
    val rnd = new scala.util.Random(17)
    // u1: metronome bot — exact 30 s cadence, 40 events
    val bot1 = (0 until 40).map(i => ev(1L, i * 30L, 100 + i))
    // u2: burst bot — 15 events inside one minute, then quiet
    val bot2 = (0 until 15).map(i => ev(2L, 3600L + i * 3L, 200 + i))
    // u3: organic — 30 events, jittered gaps (never 10-in-a-minute, no
    // dominant modal gap)
    var t3 = 0L
    val organic = (0 until 30).map { i =>
      t3 += 90L + rnd.nextInt(600); ev(3L, t3, 300 + i)
    }
    // u4: single event (no gaps at all)
    val single = Seq(ev(4L, 50L, 400))
    val df = (bot1 ++ bot2 ++ organic ++ single)
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Growth.eventsBotFlagOf(df).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("burst_max"),
          r.getAs[Long]("modal_delta_s"), r.getAs[Long]("modal_share_bp"),
          r.getAs[Long]("bot_flag"))).toMap
    assert(out(1L) == ((40L, 2L, 30L, 10000L, 1L)), s"metronome: ${out(1L)}")
    val (n2, burst2, _, _, flag2) = out(2L)
    assert(n2 == 15L && burst2 >= 10L && flag2 == 1L, s"burst bot: ${out(2L)}")
    val (_, burst3, _, share3, flag3) = out(3L)
    assert(burst3 < 10L && share3 < 2500L && flag3 == 0L, s"organic: ${out(3L)}")
    assert(out(4L) == ((1L, 1L, 0L, 0L, 0L)), s"single event: ${out(4L)}")
  }

  test("events_bot_flag: modal tie-break picks the smallest gap") {
    val base = java.sql.Timestamp.valueOf("2024-06-02 00:00:00").getTime
    // gaps: 10, 20, 10, 20 — counts tie at 2; modal_delta must be 10
    val times = Seq(0L, 10L, 30L, 40L, 60L)
    val df = times.zipWithIndex.map { case (s, i) =>
      (7L, new java.sql.Timestamp(base + s * 1000L), i.toLong, "view", 1.0)
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val r = Growth.eventsBotFlagOf(df).collect().head
    assert(r.getAs[Long]("modal_delta_s") == 10L &&
      r.getAs[Long]("modal_share_bp") == 5000L, r.toString)
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
