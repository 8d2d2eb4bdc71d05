package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Similarity, TextAnalysis}

/** Semantics pins for the round-6 operators on hand-built corpora — the
  * oracle gate proves cross-engine arithmetic; these prove the operators
  * mean what they claim on cases with known answers. */
class Round6OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("corpus_dedup_spans removes shared 8-gram spans and keeps unique text") {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val docs = Seq(
      (0L, s"$boiler one two"),
      (1L, s"$boiler three four"),
      (2L, "unique words only here nothing repeats anywhere today"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.corpusDedupSpansOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_dup_starts"),
         r.getAs[Long]("n_covered"), r.getAs[String]("kept_hash"))).toMap
    // docs 0/1 share ONLY the leading boilerplate 8-gram: its 8 positions
    // are covered and removed, the unique tails survive verbatim
    assert(out(0L) == ((10L, 1L, 8L, md5hex("one two"))))
    assert(out(1L) == ((10L, 1L, 8L, md5hex("three four"))))
    // a fully unique doc is untouched (its single 8-gram has df = 1)
    assert(out(2L) == ((8L, 0L, 0L,
      md5hex("unique words only here nothing repeats anywhere today"))))
    // below the n-gram width nothing can be flagged
    assert(out(3L) == ((2L, 0L, 0L, md5hex("tiny doc"))))
  }

  test("events_attribution credits the latest in-window click, ties to max id") {
    val ev = Seq(
      // user 1: two clicks before the purchase; the later one wins
      (10L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (11L, ts("2024-01-01 10:20:00"), 1L, "click", 0.0),
      (20L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0),
      // user 2: only click is 2h old — outside the 1h window
      (12L, ts("2024-01-01 08:00:00"), 2L, "click", 0.0),
      (21L, ts("2024-01-01 10:00:00"), 2L, "purchase", 7.0),
      // user 3: click at EXACTLY the purchase ts is attributable (<=), and
      // two clicks at the same instant break ties to the max event_id
      (13L, ts("2024-01-01 09:00:00"), 3L, "click", 0.0),
      (14L, ts("2024-01-01 09:00:00"), 3L, "click", 0.0),
      (22L, ts("2024-01-01 09:00:00"), 3L, "purchase", 9.0),
      // user 4: never clicked
      (23L, ts("2024-01-01 12:00:00"), 4L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.eventsAttributionOf(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("click_event_id")),
         r.getAs[Int]("attributed"))).toMap
    assert(out(20L) == ((Some(11L), 1)))
    assert(out(21L) == ((None, 0)))
    assert(out(22L) == ((Some(14L), 1)))
    assert(out(23L) == ((None, 0)))
  }

  test("events_transitions counts consecutive pairs per user, probs sum to 1e4") {
    val ev = Seq(
      // user 1 timeline: view -> click -> view  (two transitions)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view"),
      // user 2 timeline: view -> view; a ts tie ordered by event_id
      (4L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "view"),
      // user 3: a single event contributes no transition
      (6L, ts("2024-01-01 08:00:00"), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val rows = Analytics.eventsTransitionsOf(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("prob_e4"))).toMap
    assert(rows == Map(
      ("view", "click")  -> ((1L, 5000L)),
      ("click", "view")  -> ((1L, 10000L)),
      ("view", "view")   -> ((1L, 5000L))))
    // per-from shares reconcile to exactly 1e4 (exact halves here)
    assert(rows.collect { case ((f, _), (_, p)) if f == "view" => p }.sum == 10000L)
  }

  test("events_top_paths counts overlapping trigrams, orders by count then path") {
    val ev = Seq(
      // user 1: view click view click -> trigrams (v,c,v), (c,v,c)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "click"),
      // user 2: view click view -> (v,c,v) again (now count 2)
      (5L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 09:01:00"), 2L, "click"),
      (7L, ts("2024-01-01 09:02:00"), 2L, "view"),
      // user 3: two events only — no trigram
      (8L, ts("2024-01-01 08:00:00"), 3L, "view"),
      (9L, ts("2024-01-01 08:01:00"), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val rows = Analytics.eventsTopPathsOf(ev).collect()
      .map(r => (r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3"), r.getAs[Long]("n_paths")))
    // count-desc first, lexical tie-break after; cross-user sequences never mix
    assert(rows.toSeq == Seq(
      ("view", "click", "view", 2L),
      ("click", "view", "click", 1L)))
  }

  test("multimodal_dedup groups identical blobs, keeps the min doc_id") {
    val blobs = Seq(
      (10L, "same payload".getBytes("UTF-8")),
      (7L,  "same payload".getBytes("UTF-8")),
      (3L,  "unique payload".getBytes("UTF-8"))
    ).toDF("doc_id", "blob")
    val out = graft.operators.Multimodal.multimodalDedupOf(blobs).collect()
      .map(r => r.getAs[String]("blob_md5") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("keep_doc_id"),
         r.getAs[Long]("n_bytes"))).toMap
    assert(out(md5hex("same payload")) == ((2L, 7L, 12L)))
    assert(out(md5hex("unique payload")) == ((1L, 3L, 14L)))
    assert(out.size == 2)
  }

  test("corpus_quality_sample tiers on integer signals, keeps all high tier") {
    val highText = Array.fill(60)("alpha").mkString(" ")      // 60 toks, alpha-heavy
    val midText  = Array.fill(45)("beta").mkString(" ")       // 45 toks
    val lowText  = Array.fill(10)("x").mkString(" ")          // 10 toks
    val highPunct = Array.fill(60)("a...,,,;;;!!!").mkString(" ") // long but punct-heavy
    val docs = Seq(
      (1L, highText), (2L, midText), (3L, lowText), (4L, highPunct)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.corpusQualitySampleOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("tier"), r.getAs[Long]("rate_ppm"), r.getAs[Int]("keep"))).toMap
    assert(out(1L)._1 == "high" && out(1L)._2 == 1000000L && out(1L)._3 == 1)
    assert(out(2L)._1 == "mid"  && out(2L)._2 == 500000L)
    assert(out(3L)._1 == "low"  && out(3L)._2 == 100000L)
    // length alone can't buy the high tier: the alpha-fraction rule demotes
    assert(out(4L)._1 == "mid")
    // keep decision = hash bucket vs rate, doc-local (recompute to confirm)
    val p = 1000000007L
    def bucket(id: Long) = ((2654435761L * (id % p) + 97531L) % p) % 1000000L
    Seq(2L, 3L).foreach { id =>
      val expected = if (bucket(id) < out(id)._2) 1 else 0
      assert(out(id)._3 == expected, s"doc $id keep mismatch")
    }
  }

  test("q_argmin_join picks the cheapest supplier per part, ties to min suppkey") {
    val li = Seq(
      // part 1: supp 20 offers 5.00 twice, supp 10 offers 5.00 -> tie, pick 10
      (1L, 20L, 5.00), (1L, 20L, 7.00), (1L, 10L, 5.00),
      // part 2: supp 30 cheapest at 1.50 (its own higher offer must not matter)
      (2L, 30L, 1.50), (2L, 30L, 9.00), (2L, 10L, 2.00),
      // part 3: oversized part — filtered out by p_size
      (3L, 10L, 1.00)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val part = Seq((1L, "B1", 10), (2L, "B2", 15), (3L, "B3", 40))
      .toDF("p_partkey", "p_brand", "p_size")
    val supp = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.qArgminJoinOf(li, part, supp).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_brand"),
        r.getAs[String]("s_name"), r.getAs[Long]("best_e2")))
    assert(out.toSeq == Seq((1L, "B1", "S10", 500L), (2L, "B2", "S30", 150L)))
  }

  test("corpus_lang_confusion cells reconcile with the corpus and per-lang recalls") {
    val dir = "/root/testdata/sf0.001"
    val cells = TextAnalysis.corpusLangConfusion(spark, dir).collect()
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    // every doc lands in exactly one (lang, pred) cell
    assert(cells.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // per-lang recalls sum to 1e4 up to per-cell rounding (±1 per cell)
    cells.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val total = rows.map(_.getAs[Long]("recall_e4")).sum
      assert(math.abs(total - 10000L) <= rows.length,
        s"lang $lang recalls sum to $total")
    }
    // the diagonal exists: the heuristic gets at least one lang mostly right
    assert(cells.exists(r => r.getAs[String]("lang") == r.getAs[String]("pred_lang")
      && r.getAs[Long]("recall_e4") > 5000L))
  }

  test("embed_centroid_stats aggregates exact quantized sums per (label, dim)") {
    val emb = Seq(
      (1L, Seq(0.5f, -1.0f), 1),
      (2L, Seq(1.5f, -2.0f), 1),
      (3L, Seq(0.0f, 3.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.embedCentroidStatsOf(emb).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_q"), r.getAs[Long]("max_q"),
         r.getAs[Long]("min_q"), r.getAs[Long]("mean_e3"))).toMap
    // label 1 dim 0: q = 500, 1500 -> sum 2000, mean 1000
    assert(out((1, 0)) == ((2L, 2000L, 1500L, 500L, 1000L)))
    // label 1 dim 1: q = -1000, -2000 -> mean -1500 (negative-ratio round)
    assert(out((1, 1)) == ((2L, -3000L, -1000L, -2000L, -1500L)))
    assert(out((2, 0)) == ((1L, 0L, 0L, 0L, 0L)))
    assert(out((2, 1)) == ((1L, 3000L, 3000L, 3000L, 3000L)))
  }

  test("events_active_users counts DAU exactly and WAU over trailing 7 days") {
    val ev = Seq(
      // day 0: users 1, 2 (user 1 twice — dedup to the (user, day) grain)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 12:00:00"), 2L, "view", 0.0),
      // day 3: user 3 only -> WAU(day 3) = {1,2,3}
      (4L, ts("2024-01-04 09:00:00"), 3L, "view", 0.0),
      // day 8: user 1 -> day 0 outside [2..8]; WAU = {1, 3(day3 within)}
      (5L, ts("2024-01-09 09:00:00"), 1L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.eventsActiveUsersOf(ev).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    val d0 = ts("2024-01-01 00:00:00").getTime / 86400000L
    assert(out(d0) == ((2L, 2L)))
    assert(out(d0 + 3) == ((1L, 3L)))     // both day-0 users still in window
    assert(out(d0 + 8) == ((1L, 2L)))     // day 0 aged out, day 3 still in
    assert(out.size == 3)                  // only days WITH activity report
  }

  test("events_inter_arrival attributes same-user gaps to the arriving event's type") {
    val ev = Seq(
      // user 1: view @0s -> click @10s (gap 10 to click) -> view @40s (gap 30)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 10:00:10"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:00:40"), 1L, "view", 0.0),
      // user 2: single event -> contributes no gap
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.eventsInterArrivalOf(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("sum_gap_s"),
         r.getAs[Double]("p50_gap_s"), r.getAs[Long]("max_gap_s"))).toMap
    assert(out("click") == ((1L, 10L, 10.0, 10L)))
    assert(out("view") == ((1L, 30L, 30.0, 30L)))   // cross-user gap excluded
    assert(out.size == 2)
  }

  test("q_custdist partitions every customer into exactly one order-count bin") {
    val out = Analytics.qCustdist(spark, sfDir).collect()
    val nCustomers = graft.sources.Tables.customer(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("custdist")).sum == nCustomers)
    // the zero bin holds exactly the customers with no qualifying order
    // (possibly none: sf0.001's 150 custkeys all appear in orders)
    val withOrders = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    val zeroBin = out.collectFirst {
      case r if r.getAs[Long]("c_count") == 0L => r.getAs[Long]("custdist")
    }.getOrElse(0L)
    assert(zeroBin == nCustomers - withOrders)
    // bins are distinct and counts positive
    val bins = out.map(_.getAs[Long]("c_count"))
    assert(bins.distinct.length == bins.length)
    assert(out.forall(_.getAs[Long]("custdist") > 0L))
  }

  test("q_histogram bins cover all orders and cents reconcile with the total") {
    val out = Analytics.qHistogram(spark, sfDir).collect()
    val orders = graft.sources.Tables.orders(spark, sfDir)
    assert(out.map(_.getAs[Long]("n_orders")).sum == orders.count())
    // per-row rounded cents summed across bins == the same sum unbinned
    val totalCents = orders
      .select(sum(round(col("o_totalprice") * 100).cast("long")))
      .head().getLong(0)
    assert(out.map(_.getAs[Long]("sum_price_e2")).sum == totalCents)
    // bin lower bounds are strictly increasing multiples of 50k
    val los = out.map(_.getAs[Long]("bin_lo"))
    assert(los.sameElements(los.sorted) && los.forall(_ % 50000L == 0L))
  }

  test("dedup_semantic drops the more-central member of a within-cell dup pair") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val emb = Seq(
      (1L, Seq(1.0, 0.05)),  // cell 0, most central — the drop candidate
      (2L, Seq(1.0, 0.10)),  // cell 0, near-dup of 1 but less central
      (3L, Seq(0.1, 1.0))    // cell 1, alone — untouched
    ).toDF("vec_id", "embedding")
    val out = Similarity.dedupSemanticOf(emb, centroids).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vec_id") == 1L)
    assert(out.head.getAs[Long]("cell") == 0L)
    assert(out.head.getAs[Long]("n_pairs") == 1L)
    // a dissimilar vector in the same cell must NOT pair: push 2 below the
    // cosine threshold by flipping it near-orthogonal (still cell 0)
    val emb2 = Seq(
      (1L, Seq(1.0, 0.05)),
      (2L, Seq(0.3, -0.9))
    ).toDF("vec_id", "embedding")
    assert(Similarity.dedupSemanticOf(emb2, centroids).isEmpty)
  }

  test("dedup_semantic sub-blocking bounds pair volume on a one-cell corpus") {
    // 40 near-identical vectors, all landing in cell 0: unguarded this is
    // 780 candidate pairs; maxBlock=10 caps candidates to within-sub-block
    // pairs only, and every emitted drop decision is still cell-0-consistent
    val emb = (1L to 40L).map(i => (i, Seq(1.0, i / 1e6))).toDF("vec_id", "embedding")
    val out = Similarity.dedupSemanticOf(emb, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      maxBlock = 10L)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("cell") == 0L))
    // 4 sub-blocks of ~10 → ≈45 pairs/block; dropped ids’ pair counts must
    // sum to the sub-blocked candidate volume, far below the 780 all-pairs
    val nPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(nPairs > 0L && nPairs < 300L,
      s"sub-blocked pair volume should be ~180, was $nPairs")
  }

  test("corpus_filter bitmask pins each Gopher rule independently") {
    // passes all rules: 40 words alternating lengths 4/5 → mwl exactly 4.5
    // (boundary INCLUDED), alpha frac 180/219 ≈ 0.822 ≥ 0.81
    val good = (0 until 40).map(i => if (i % 2 == 0) "abcd" else "abcde").mkString(" ")
    val short = "ab cd" // bit 0 (2 words) + bit 2 (mwl 2.0) + bit 3 (4/5 = 0.8)
    val longWords = Seq.fill(40)("abcdefgh").mkString(" ") // bit 2 only (mwl 8)
    val digits = Seq.fill(40)("ab12").mkString(" ") // bit 2 (mwl 2) + bit 3 (0.402)
    val docs = Seq((0L, good), (1L, short), (2L, longWords), (3L, digits))
      .toDF("doc_id", "text")
    val out = TextAnalysis.corpusFilterOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fail_mask"), r.getAs[Int]("keep"))).toMap
    assert(out(0L) == ((0L, 1)))
    assert(out(1L) == ((13L, 0)))
    assert(out(2L) == ((4L, 0)))
    assert(out(3L) == ((12L, 0)))
  }

  test("events_anomaly flags a volume spike, stays quiet on uniform days") {
    // type a: 9 days of 10 events + one 110-event spike → mean 20, σ 30,
    // spike z = 3.0 (flagged), normal days z = −0.3333 (not)
    val a = (1 to 9).flatMap(d =>
      Seq.fill(10)((ts(f"2024-01-0$d%d 10:00:00"), "a"))) ++
      Seq.fill(110)((ts("2024-01-10 10:00:00"), "a"))
    // type b: perfectly uniform → z exactly 0 everywhere
    val b = (1 to 3).flatMap(d => Seq.fill(5)((ts(s"2024-02-0$d 09:00:00"), "b")))
    val out = Analytics.eventsAnomalyOf((a ++ b).toDF("ts", "event_type")).collect()
    val aRows = out.filter(_.getAs[String]("event_type") == "a")
    val spike = aRows.filter(_.getAs[Long]("n_events") == 110L)
    assert(spike.length == 1 && spike.head.getAs[Double]("z") == 3.0
      && spike.head.getAs[Int]("is_anomaly") == 1)
    val normals = aRows.filter(_.getAs[Long]("n_events") == 10L)
    assert(normals.length == 9 &&
      normals.forall(r => r.getAs[Double]("z") == -0.3333 && r.getAs[Int]("is_anomaly") == 0))
    assert(out.filter(_.getAs[String]("event_type") == "b")
      .forall(r => r.getAs[Double]("z") == 0.0 && r.getAs[Int]("is_anomaly") == 0))
  }

  test("embed_quantize emits exact int8 codes checksums") {
    val emb = Seq(
      (1L, Seq(1.0, -0.5, 0.25, 0.0)), // scale 1/127 → codes 127,−64,32,0
      (2L, Seq(0.0, 0.0)),             // zero vector → all checksums 0
      (3L, Seq(-2.0, 1.0))             // scale 2/127 → codes −127, 64
    ).toDF("vec_id", "embedding")
    val out = Similarity.embedQuantizeOf(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dims"), r.getAs[Long]("amax_e6"),
          r.getAs[Long]("code_sum"), r.getAs[Long]("code_ssq"),
          r.getAs[Long]("code_max")))).toMap
    assert(out(1L) == ((4L, 1000000L, 95L, 21249L, 127L)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == ((2L, 2000000L, -63L, 20225L, 127L)))
  }

  test("q_range_frame matches a brute-force trailing-90-day sum on random data") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong + 1L, i.toLong,
        new Timestamp(base + rnd.nextInt(300 * 86400).toLong * 1000L),
        rnd.nextInt(1000000) / 100.0)
    }
    val df = rows.toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = Analytics.qRangeFrameOf(df).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("spend_90d_e2")).toMap
    rows.foreach { case (ck, ok, ts0, _) =>
      val want = rows.collect { case (c2, _, t2, p2)
        if c2 == ck && t2.getTime / 1000 <= ts0.getTime / 1000 &&
          t2.getTime / 1000 >= ts0.getTime / 1000 - 7776000L =>
        math.round(p2 * 100)
      }.sum
      assert(got(ok) == want, s"orderkey $ok: got ${got(ok)}, want $want")
    }
  }

  test("corpus_dsir scores target-domain-like docs above off-domain docs") {
    // target = lang 'en'; en docs share an en-only vocabulary, zh docs a
    // disjoint one, so importance log-ratios must separate them cleanly
    val docs = (0L until 20L).map { i =>
      if (i < 10) (i, "en", "hello world training data pipeline quality")
      else (i, "zh", "nihao shijie xunlian shuju guandao zhiliang")
    }.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.corpusDsirOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_e4")).toMap
    val en = (0L until 10L).map(out)
    val zh = (10L until 20L).map(out)
    assert(en.distinct.size == 1 && zh.distinct.size == 1)
    assert(en.head > zh.head,
      s"en docs must score above zh docs: en=${en.head} zh=${zh.head}")
    // with a 50/50 corpus the target half must score positive (more
    // target-like than the corpus average) and the off half negative
    assert(en.head > 0 && zh.head < 0)
  }
}
