package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 operator semantics, pinned. */
class Round8OpsSpec extends SparkSpecBase {
  import graft.operators.Components

  private def edgeDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lbl")).toMap

  /** Driver-side ground truth: union-find over the same edges. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("minLabel (large/small-star): equals union-find on randomized graphs") {
    val rnd = new scala.util.Random(8)
    for (trial <- 1 to 8) {
      // a mix of shapes: sparse random pairs over a sparse id space (wide
      // 64-bit-ish ids included), plus a planted chain so every trial has a
      // high-diameter component the one-hop form would crawl
      val n = 30 + rnd.nextInt(50)
      val ids = Seq.fill(n)(rnd.nextLong().abs % 1000000007L + 3L).distinct
      val pairs = Seq.fill(n)((ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
        .filter(p => p._1 != p._2) ++
        ids.sorted.sliding(2).collect { case Seq(x, y) if rnd.nextBoolean() => (x, y) }
      val want = unionFind(pairs)
      val got = labelsOf(Components.minLabel(edgeDf(pairs)))
      assert(got == want, s"trial $trial: hybrid labels diverge from union-find")
      // the pure star fixpoint and the pre-r8 propagation form must land
      // on the same contract — the hybrid is only ever gluing those two
      val star = labelsOf(Components.starFixpoint(edgeDf(pairs))._1)
      assert(star == want, s"trial $trial: star vs union-find")
      val prop = labelsOf(Components.minLabelPropagation(edgeDf(pairs)))
      assert(got == prop, s"trial $trial: hybrid vs propagation")
    }
  }

  test("starFixpoint stop test (r14): forest stops in one round, near-forest traps do not stop wrong") {
    // (a) a disjoint star forest IS a common fixpoint: the loop must
    // detect it on the first count-stall round and stop after exactly one
    // (identity) round — the isStarForest fast path
    val forest = Seq((5L, 1L), (7L, 1L), (9L, 2L), (12L, 2L), (30L, 20L))
    val (fl, fr) = Components.starFixpoint(edgeDf(forest))
    assert(fr == 1, s"star forest took $fr rounds — stop test not firing")
    assert(labelsOf(fl) == unionFind(forest), "star forest labels diverge")
    // (b) the two non-forest shapes the one-aggregate test distinguishes:
    // a node on BOTH sides (chain 3→2→1: distinct a's, but 2 is an a and
    // a b) and a duplicate a (3→1, 3→2: node 3 carries two targets).
    // Neither may terminate with those edges accepted as final stars —
    // the labels must still be the component minima.
    val chain = Seq((3L, 2L), (2L, 1L))
    assert(labelsOf(Components.starFixpoint(edgeDf(chain))._1) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "chain trap mislabeled")
    val dupA = Seq((3L, 1L), (3L, 2L))
    assert(labelsOf(Components.starFixpoint(edgeDf(dupA))._1) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "duplicate-a trap mislabeled")
  }

  test("minLabel: log-bounded rounds on a chain (the diameter case)") {
    // a 1024-vertex chain has diameter 1023: the pure propagation form
    // needs ~1023 rounds; the hybrid must land in budget + O(log n) — the
    // entire point of the r8 change. PropRoundBudget + 2·log2(n) + 2 is a
    // generous ceiling (measured: 6 + 9 rounds at n=1024).
    val n = 1024
    val pairs = (0L until n.toLong).sliding(2).map { case Seq(x, y) => (x, y) }.toSeq
    val (labels, rounds) = Components.minLabelWithRounds(edgeDf(pairs))
    assert(rounds <= Components.PropRoundBudget
        + 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 2,
      s"chain of $n took $rounds rounds — not log-bounded")
    val got = labelsOf(labels)
    assert(got.size == n && got.values.forall(_ == 0L), "chain collapses to min id 0")
  }

  test("dedup_recall: all four methods emit healthy floor rows") {
    // r8 extension: containment (capped-vs-uncapped pair recall) and fuzzy
    // decontamination (flagged-doc recall vs exact extract Jaccard ≥ 0.5)
    // join minhash/simhash behind the same floor-row discipline — a recall
    // regression in ANY of the four drops its row in the driver's count
    val rows = graft.operators.Dedup.dedupRecall(spark, sfDir).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("recall_e2"), r.getAs[Long]("floor_e2"))).toMap
    assert(rows.keySet == Set("minhash", "simhash", "containment", "fuzzy_decon"))
    rows.foreach { case (m, (rec, floor)) =>
      assert(rec >= floor, s"$m recall $rec below floor $floor")
    }
    // the fuzzy truth is non-vacuous on the gate corpus: every benchmark
    // extract's source doc shares ≥ 90% of its tokens, so truth ≥ 1 doc
    assert(rows("fuzzy_decon")._1 > 0L)
  }

  test("corpus_semantic_mix: rate algebra replays exactly; tempering is monotone") {
    import org.apache.spark.sql.functions._
    val dir = sfDir
    // replay the twin's keep rule driver-side from (doc_id, cell, idHash)
    // using the SAME IEEE expression order — the oracle-gate arithmetic
    // must be a property of the algebra, not of one engine's planner
    val twin = graft.operators.OracleVariants.corpusSemanticMixOracle(spark, dir)
      .collect().map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))).toMap
    val rows = graft.operators.OracleVariants.corpusSemanticMixMembers(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("h")))
    val nCell = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val w = nCell.view.mapValues(n => math.round(math.sqrt(n.toDouble) * 1000)).toMap
    val nTot = nCell.values.sum
    val wTot = w.values.sum
    def rate(c: Long): Double = math.min(1.0,
      w(c).toDouble / wTot.toDouble * (nTot.toDouble / 2.0) / nCell(c).toDouble)
    val sampled = rows.groupBy(_._2).map { case (c, rs) =>
      c -> rs.count { case (_, _, h) => (h % 1000000L).toDouble < rate(c) * 1000000.0 }.toLong
    }
    assert(twin.view.mapValues(_._2).toMap == sampled,
      "driver replay of the tempered keep rule diverges from the twin")
    assert(twin.view.mapValues(_._1).toMap == nCell)
    // tempering: rates are non-increasing in cell size (∝ n^{-1/2}), and
    // every cell keeps at least the hard least-cell rule's share
    val byN = nCell.toSeq.sortBy(_._2).map { case (c, n) => (n, rate(c)) }
    byN.sliding(2).foreach {
      case Seq((n1, r1), (n2, r2)) if n1 < n2 =>
        assert(r1 >= r2 - 1e-12, s"rate must not increase with cell size ($n1→$n2)")
      case _ => ()
    }
    // sqrt-weight rounding margins at all three SFs (the TemperedMixSpec
    // discipline): a weight flip anywhere would silently shift every rate
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      graft.operators.OracleVariants.corpusSemanticMixOracle(spark, d)
        .select(col("n_docs")).collect().map(_.getLong(0)).foreach { n =>
        val x = math.sqrt(n.toDouble) * 1000
        val frac = x - math.floor(x)
        assert(math.abs(frac - 0.5) > 1e-6, s"weight for n=$n sits on a .5 boundary in $d")
      }
    }
  }

  test("corpus_chunk: exact window arithmetic and end-to-end coverage on long docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the gate corpus is short-doc (1 chunk/doc), so the multi-chunk path
    // is pinned here: known token counts across the boundary cases
    val docs = Seq(
      (1L, (0 until 1500).map(i => s"w$i").mkString(" ")), // 4 chunks
      (2L, (0 until 512).map(i => s"x$i").mkString(" ")),  // exactly window
      (3L, (0 until 513).map(i => s"y$i").mkString(" ")),  // window+1 → 2 chunks
      (4L, "solo"),                                        // 1 token
      (5L, ""))                                            // empty doc
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.corpusChunkOf(docs, 512L, 384L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_toks"),
        r.getAs[String]("chunk_hash")))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def expected(id: Long, toks: Seq[String]) = {
      val n = toks.length
      val nc = if (n <= 512) 1L else (n - 512 + 383) / 384 + 1L
      (0L until nc).map { c =>
        val start = c * 384
        val len = math.min(512L, n - start)
        (id, c, start, len, md5hex(toks.slice(start.toInt, (start + len).toInt).mkString(" ")))
      }
    }
    val want = Seq(
      expected(1L, (0 until 1500).map(i => s"w$i")),
      expected(2L, (0 until 512).map(i => s"x$i")),
      expected(3L, (0 until 513).map(i => s"y$i")),
      expected(4L, Seq("solo")),
      expected(5L, Seq.empty)).flatten
    assert(out.toSeq == want)
    // coverage invariant: per doc, the last chunk reaches the end and
    // consecutive starts differ by exactly the stride
    out.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.toSeq.sortBy(_._2)
      assert(sorted.last._3 + sorted.last._4 >= sorted.map(c => c._3 + c._4).max, s"doc $id")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 - a._3 == 384L, s"doc $id stride")
        case _ => ()
      }
    }
  }

  test("events_stickiness: driver replay of dau/mau/ratio on the gate corpus") {
    import org.apache.spark.sql.functions._
    val ud = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"))).toSet
    val dau = ud.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val mau = ud.toSeq.flatMap { case (u, d) => (d until d + 30).map(u -> _) }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val want = dau.keys.map { d =>
      d -> ((dau(d), mau(d), dau(d) * 10000 / mau(d)))
    }.toMap
    val got = graft.operators.Analytics.eventsStickiness(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day") -> ((r.getAs[Long]("dau"), r.getAs[Long]("mau"),
        r.getAs[Long]("stickiness_bp")))).toMap
    assert(got == want)
    got.values.foreach { case (d, m, bp) =>
      assert(m >= d && bp >= 0 && bp <= 10000)
    }
  }

  test("multimodal_clusters: equals union-find over digest + frame-band edges") {
    val dir = sfDir
    val exact = graft.operators.Multimodal.multimodalDedup(spark, dir).collect()
      .filter(_.getAs[Long]("n_copies") > 1)
    // rebuild the digest-star edges driver-side from the blob table
    val byHash = graft.sources.Tables.documents(spark, dir)
      .selectExpr("doc_id", "md5(cast(text as binary)) as h").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("h"))
      .groupBy(_._2).values.map(_.map(_._1).sorted)
    val exactEdges = byHash.filter(_.size > 1)
      .flatMap(g => g.tail.map(d => (d, g.head))).toSeq
    val nearEdges = graft.operators.Multimodal.multimodalNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (exactEdges ++ nearEdges).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = graft.operators.Multimodal.multimodalClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))).toMap
    got.foreach { case (d, (c, keep)) =>
      val want = find(d)
      assert(c == want, s"doc $d cluster $c != $want")
      assert(keep == (c == d))
    }
    assert(got.values.exists(!_._2), "gate corpus has at least one dropped duplicate blob")
  }

  test("text_readability: exact signal replay through Java regex") {
    import spark.implicits._
    val texts = Seq(
      (1L, "The quick brown fox jumps. Over the lazy dog! Yes?"),
      (2L, "unbroken stream of extremely lengthy vocabulary items"),
      (3L, ""),
      (4L, "a e i o u aeiou xyz."))
    val out = graft.operators.TextAnalysis.textReadabilityOf(
      texts.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_long_words"),
        r.getAs[Long]("n_vowel_groups"), r.getAs[Long]("lix_e2")))).toMap
    texts.foreach { case (id, t) =>
      val nS = "[.!?]+".r.findAllIn(t).size.toLong
      val nW = "\\S+".r.findAllIn(t).size.toLong
      val nL = "\\S{7,}".r.findAllIn(t).size.toLong
      val nV = "[aeiou]+".r.findAllIn(t.toLowerCase).size.toLong
      val lix = nW * 100 / math.max(1L, nS) + nL * 10000 / math.max(1L, nW)
      assert(out(id) == ((nS, nW, nL, nV, lix)), s"doc $id")
    }
  }

  test("knn_filtered: predicate respected, recall floor vs exact filtered brute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.Similarity.knnFiltered(spark, dir)
    val en = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val rows = out.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id")))
    assert(rows.nonEmpty && rows.forall { case (_, n) => en(n) },
      "a filtered search must NEVER return a neighbor outside the predicate")
    // exact filtered baseline: probing every cell degenerates to brute
    // force over the same keep-set (the knnIvfWith degeneration contract)
    val cents = graft.operators.Similarity.loadOrTrainCentroids(spark, dir)
    val keep = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en").select(col("doc_id"))
    val exact = graft.operators.Similarity
      .knnIvfFilteredWith(spark, dir, cents, nprobe = cents.length, keepIds = keep)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hit = rows.count(exact)
    val recall = hit.toDouble / exact.size
    assert(recall >= 0.50, s"filtered recall@5 $recall below floor 0.50 (measured 0.58; floor raised r9 per the r8 verdict's stretch item)")
    // nprobe=4 compensates the thinned cells: strictly deeper probing than
    // the unfiltered knn_ivf default
  }

  test("embed_outliers: flags consistent with csim; non-degenerate fraction") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.operators.Similarity.embedOutliers(spark, dir).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[Long]("csim_e4"), r.getAs[Boolean]("is_outlier")))
      assert(rows.nonEmpty)
      rows.foreach { case (id, _, c, o) =>
        assert(o == (c < 2000L), s"vec $id flag inconsistent with csim $c")
        assert(c >= -10000L && c <= 10000L, s"vec $id csim_e4 $c out of range")
      }
      val frac = rows.count(_._4).toDouble / rows.length
      assert(frac > 0.0 && frac < 0.3,
        s"outlier fraction $frac degenerate in $dir (threshold mis-tuned)")
      // the twin agrees on the flagging shape over its own cell family
      val twin = graft.operators.OracleVariants.embedOutliersOracle(spark, dir)
        .collect().map(r => (r.getAs[Long]("csim_e4"), r.getAs[Boolean]("is_outlier")))
      twin.foreach { case (c, o) => assert(o == (c < 1500L)) }
    }
  }

  test("dedup_cross_source: finds planted syndication; disjoint from same-source pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted: the same article on two sources (syndication), a same-source
    // near-dup (dedup_ngram's case, must NOT appear here), and an unrelated doc
    val article = (0 until 60).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-xsource").toString
    Seq(
      (1L, "en", "siteA", article),
      (2L, "en", "siteB", article + " extra trailing line"),
      (3L, "en", "siteA", article + " tiny edit"),
      (4L, "en", "siteC", (100 until 170).map(i => s"other$i").mkString(" ")),
      (5L, "fr", "siteB", article)) // different lang: blocked apart
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Dedup.dedupCrossSource(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), "planted syndication pair missed")
    pairs.foreach { case (_, _, sa, sb) => assert(sa != sb, "same-source pair leaked") }
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L), "1-3 share a source")
    assert(!pairs.exists(p => p._2 == 5L || p._1 == 5L), "cross-lang pair leaked")
    // on the gate corpus: cross-source and same-source pair sets are
    // provably disjoint (complementary source predicates)
    val cross = graft.operators.Dedup.dedupCrossSource(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val same = graft.operators.Dedup.dedupNgram(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert((cross & same).isEmpty)
  }

  test("events_attribution_first: earliest-click credit, consistent with last-touch") {
    import org.apache.spark.sql.functions._
    val first = graft.operators.Analytics.eventsAttributionFirst(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.sql.Timestamp]("click_ts")), r.getAs[Int]("attributed"))).toMap
    val last = graft.operators.Analytics.eventsAttribution(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.sql.Timestamp]("click_ts")), r.getAs[Int]("attributed"))).toMap
    assert(first.keySet == last.keySet)
    // same window ⇒ identical attribution EXISTENCE; first ≤ last in time
    first.foreach { case (id, (fts, fat)) =>
      val (lts, lat) = last(id)
      assert(fat == lat, s"purchase $id attribution existence diverges")
      (fts, lts) match {
        case (Some(f), Some(l)) => assert(!f.after(l), s"purchase $id first > last")
        case (None, None) => ()
        case other => fail(s"purchase $id: $other")
      }
    }
    assert(first.values.exists(_._2 == 1), "non-vacuous: some purchase attributes")
    // driver fold: the earliest qualifying click really is the credit
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type")))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    ev.filter(_._4 == "purchase").foreach { case (pid, u, pts, _) =>
      val want = clicksByUser.getOrElse(u, Array.empty)
        .filter(c => !c._3.after(pts) && c._3.getTime >= pts.getTime - 3600L * 1000L)
        .sortBy(c => (c._3.getTime, -c._1)).headOption.map(_._3)
      assert(first(pid)._1 == want, s"purchase $pid earliest-click mismatch")
    }
  }

  test("minLabel: degenerate inputs (empty, self-loops, two nodes)") {
    import spark.implicits._
    assert(Components.minLabel(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0L)
    // self-loop-only vertices still get a self label (the contract owes
    // every edge-incident vertex a row)
    val selfy = labelsOf(Components.minLabel(edgeDf(Seq((7L, 7L), (9L, 3L)))))
    assert(selfy == Map(7L -> 7L, 9L -> 3L, 3L -> 3L))
    assert(labelsOf(Components.minLabel(edgeDf(Seq((5L, 2L))))) == Map(5L -> 2L, 2L -> 2L))
  }

  test("events_trend: driver OLS replay over the dense day grid") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min
    val d1 = daily.map(_._2).max
    val got = graft.operators.Analytics.eventsTrend(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
          r.getAs[Long]("slope_e6"), r.getAs[Long]("icept_e6"))).toMap
    val types = daily.map(_._1).distinct
    assert(got.keySet == types.toSet)
    types.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(c => c._2 -> c._3).toMap
      // zero days COUNT: the dense grid spans the CORPUS range
      val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val xs = ys.indices.map(_.toLong)
      val (n, sx, sy) = (xs.size.toLong, xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val slope = (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx)
      val icept = (sy * 1000000L - slope * sx) / n // Long / = trunc-to-zero = DIV
      assert(got(t) == ((n, sy, slope, icept)), s"$t OLS mismatch")
    }
    // non-vacuous: the gate corpus has both rising and falling types
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 0))
  }

  test("text_memorization: planted duplication is counted, unique text is not") {
    import spark.implicits._
    // doc 1 and 2 share an 8-word run (6 shared trigrams), doc 3 is unique,
    // doc 4 repeats doc 1 verbatim (every trigram dup), doc 5 is too short
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"unique one lead $shared trail one"),
      (2L, s"other two start $shared finish two"),
      (3L, "completely different words nothing shared here at all"),
      (4L, s"unique one lead $shared trail one"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusStats.textMemorizationOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1/4 are clones: all trigrams dup
    assert(got(1L)._1 == got(1L)._2 && got(1L)._3 == 10000L, s"clone pair: ${got(1L)}")
    assert(got(4L) == got(1L))
    // doc 2 shares exactly the trigrams inside the planted run with 1/4:
    // 8 shared words ⇒ 6 shared trigrams of its 11 total (13 tokens);
    // boundary trigrams straddling the run differ by construction
    assert(got(2L) == ((11L, 6L, 6L * 10000L / 11L)), s"partial overlap: ${got(2L)}")
    assert(got(3L)._2 == 0L && got(3L)._3 == 0L)
    assert(got(5L) == ((0L, 0L, 0L)), "sub-trigram doc reports zeros")
  }

  test("corpus_ppl_bucket: terciles are score-ordered and histogram-balanced") {
    val rows = graft.operators.CorpusStats.corpusPplBucket(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("avg_lp_e4"),
        r.getAs[String]("bucket")))
    assert(rows.nonEmpty && rows.map(_._3).toSet == Set("head", "middle", "tail"))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      // ORDER property: min(head) ≥ max(middle) ≥ ... at bin granularity
      // (equal scores always share a bucket, so boundaries cannot interleave)
      def scores(b: String) = rs.filter(_._3 == b).map(_._2)
      Seq("head" -> "middle", "middle" -> "tail").foreach { case (hi, lo) =>
        if (scores(hi).nonEmpty && scores(lo).nonEmpty)
          assert(scores(hi).min >= scores(lo).max, s"$lang: $hi below $lo")
      }
      // BALANCE property: each bucket within bin-grain slack of n/3 — the
      // largest boundary bin is the worst-case imbalance by construction
      val n = rs.size
      val maxBin = rs.groupBy(r => r._2).values.map(_.size).max
      Seq("head", "middle", "tail").foreach { b =>
        val cnt = scores(b).size
        assert(math.abs(cnt - n / 3) <= maxBin + 1,
          s"$lang/$b: $cnt docs vs n/3=${n / 3} (maxBin $maxBin)")
      }
      // equal scores share fate (whole-bin buckets — the tie rule)
      rs.groupBy(_._2).values.foreach(g => assert(g.map(_._3).distinct.size == 1))
    }
  }

  test("events_trend_anomaly: driver replay of the residual flag rule") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min
    val d1 = daily.map(_._2).max
    val want = daily.map(_._1).distinct.flatMap { t =>
      val byDay = daily.filter(_._1 == t).map(c => c._2 -> c._3).toMap
      val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val xs = ys.indices.map(_.toLong)
      val (n, sx, sy) = (xs.size.toLong, xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val slope = (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx)
      val icept = (sy * 1000000L - slope * sx) / n
      val resid = xs.map(x => (x, ys(x.toInt), ys(x.toInt) - (icept + slope * x) / 1000000L))
      val sse = resid.map(r => r._3 * r._3).sum
      resid.filter(r => n * r._3 * r._3 > 4L * sse)
        .map(r => (t, d0 + r._1, r._2, r._2 - r._3, r._3))
    }.toSet
    val got = graft.operators.Analytics.eventsTrendAnomaly(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("y"), r.getAs[Long]("pred"), r.getAs[Long]("r"))).toSet
    assert(got == want, s"flag sets diverge: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "gate corpus must flag at least one day")
  }

  test("graph_hits: replay on a hand-built graph; roles separate; gate invariants") {
    import spark.implicits._
    // a buys from b and c; b buys from c. c sells only (pure authority),
    // a buys only (pure hub).
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b", 400L), ("a", "c", 600L), ("b", "c", 1000L))
      .toDF("src", "dst", "w")
    val got = graft.operators.GraphOps.graphHitsOf(nodes, edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver replay of the exact integer arithmetic
    val wmax = 1000L
    val wn = Map(("a", "b") -> 400L * 1000000L / wmax, ("a", "c") -> 600L * 1000000L / wmax,
      ("b", "c") -> 1000L * 1000000L / wmax)
    var auth = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    var hub = auth
    def norm(raw: Map[String, Long]): Map[String, Long] = {
      val m = raw.values.max
      Seq("a", "b", "c").map(v =>
        v -> (if (m > 0) raw.getOrElse(v, 0L) * 1000000L / m else 0L)).toMap
    }
    for (_ <- 1 to graft.operators.GraphOps.HitsIters) {
      hub = norm(wn.groupBy(_._1._1).view.mapValues(
        _.map { case ((_, d), w) => auth(d) * w / 1000000L }.sum).toMap)
      auth = norm(wn.groupBy(_._1._2).view.mapValues(
        _.map { case ((s, _), w) => hub(s) * w / 1000000L }.sum).toMap)
    }
    Seq("a", "b", "c").foreach { v =>
      assert(got(v) == ((hub(v), auth(v))), s"$v: ${got(v)} vs ${(hub(v), auth(v))}")
    }
    // role separation: the pure buyer scores ONLY as hub, the pure seller
    // ONLY as authority — exactly what PageRank's single score conflates
    assert(got("a")._1 > 0L && got("a")._2 == 0L, s"a: ${got("a")}")
    assert(got("c")._1 == 0L && got("c")._2 == 1000000L, s"c: ${got("c")}")

    // gate graph: 25 nations, scores in [0, 1e6], each vector max-normalized
    val gate = graft.operators.GraphOps.graphHits(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(gate.length == 25)
    assert(gate.forall(g => g._2 >= 0 && g._2 <= 1000000L &&
      g._3 >= 0 && g._3 <= 1000000L))
    assert(gate.map(_._2).max == 1000000L && gate.map(_._3).max == 1000000L,
      "each half-step max-normalizes to exactly 1e6")
    assert(gate.map(_._2).distinct.length > 5 && gate.map(_._3).distinct.length > 5,
      "degenerate score vectors")
  }

  test("graph_pagerank: exact integer replay on a hand-built graph + gate invariants") {
    import spark.implicits._
    // 3-node weighted digraph with a dangling node (c has no out-edges)
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b", 300L), ("a", "c", 100L), ("b", "c", 500L))
      .toDF("src", "dst", "w")
    val got = graft.operators.GraphOps.graphPagerankOf(nodes, edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver replay of the EXACT production arithmetic (trunc-to-zero divs)
    val sharesByDst = Map(
      ("a", "b") -> (300L * 1000000000L / 400L),
      ("a", "c") -> (100L * 1000000000L / 400L),
      ("b", "c") -> (500L * 1000000000L / 500L))
    var r = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    for (_ <- 1 to graft.operators.GraphOps.PageRankIters) {
      val in = Seq("a", "b", "c").map { v =>
        v -> sharesByDst.collect { case ((s, d), sh) if d == v => r(s) * sh / 1000000000L }.sum
      }.toMap
      r = in.map { case (v, m) => v -> (150000L + 85L * m / 100L) }
    }
    assert(got == r, s"replay mismatch: $got vs $r")
    // rank orders by influence: c (fed by everyone) > b > a (teleport only)
    assert(got("c") > got("b") && got("b") > got("a") && got("a") == 150000L)

    // gate graph invariants: teleport floor, conservation ceiling, 25 rows
    val gate = graft.operators.GraphOps.graphPagerank(spark, sfDir).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1))
    assert(gate.length == 25 && gate.map(_._1).distinct.length == 25)
    assert(gate.forall(_._2 >= 150000L), "teleport floor violated")
    assert(gate.map(_._2).sum <= 25L * 1000000L, "rank mass grew")
    assert(gate.sortBy(r2 => (-r2._2, r2._1)).toSeq == gate.toSeq, "gate order")
    assert(gate.map(_._2).distinct.length > 5, "degenerate rank vector")
  }
}
