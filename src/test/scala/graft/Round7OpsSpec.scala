package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Multimodal}

/** Semantics pins for the round-7 operators on hand-built corpora — the
  * oracle gate proves cross-engine arithmetic; these prove the operators
  * mean what they claim on cases with known answers. */
class Round7OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("text_bigram_logprob: n_bigrams = n_toks - 1, scores non-positive, flags shuffled transitions") {
    val dir = "/root/testdata/sf0.001"
    val bi = graft.operators.TextAnalysis.textBigramLogprob(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_logprob_e4"))).toMap
    val uni = graft.operators.TextAnalysis.textUnigramLogprob(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_toks")).toMap
    // every doc with >=2 tokens appears, with exactly n_toks-1 adjacent pairs
    val multi = uni.filter(_._2 >= 2)
    assert(multi.nonEmpty && bi.keySet == multi.keySet)
    multi.foreach { case (d, nt) => assert(bi(d)._1 == nt - 1, s"doc $d") }
    // each element is round(ln(p)*1e4) with p <= 1, so every sum is <= 0
    assert(bi.values.forall(_._2 <= 0L))
    // a deterministic chain scores 0; real prose does not: at least one doc
    // must have strictly negative transitions or the signal is vacuous
    assert(bi.values.exists(_._2 < 0L))
  }

  test("events_rfm buckets quartiles from broadcast thresholds, no analytic window") {
    // 8 users: user u has u events on 2024-01-(10+u), value u*10; only even
    // users purchase. Distinct r/f/m values per user make bucketing total.
    val ev = (for {
      u <- 1L to 8L
      i <- 0L until u
    } yield (u * 1000 + i, ts(f"2024-01-${10 + u.toInt}%02d 12:00:00"), u,
      if (u % 2 == 0) "purchase" else "click", u * 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.eventsRfmOf(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.size == 8)
    // monetary counts ONLY purchases: even user u has u purchases of u*10
    (1L to 8L).foreach { u =>
      val expected = if (u % 2 == 0) u * u * 1000 else 0L
      assert(out(u).getAs[Long]("monetary_e2") == expected)
      assert(out(u).getAs[Long]("frequency") == u)
      assert(out(u).getAs[Long]("recency_days") == 8 - u)
      // segment is the positional digit code of the three buckets
      val (r, f, m) = (out(u).getAs[Long]("r_q"), out(u).getAs[Long]("f_q"),
        out(u).getAs[Long]("m_q"))
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(out(u).getAs[Long]("segment") == r * 100 + f * 10 + m)
    }
    // 8 distinct frequencies split 2 per quartile, monotone in frequency
    val fBuckets = (1L to 8L).map(u => out(u).getAs[Long]("f_q"))
    assert(fBuckets.toSeq == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    // recency quartiles must run OPPOSITE to user id (older last event =
    // higher recency bucket): user 8 was seen most recently
    val rBuckets = (1L to 8L).map(u => out(u).getAs[Long]("r_q"))
    assert(rBuckets.toSeq == Seq(4L, 4L, 3L, 3L, 2L, 2L, 1L, 1L))
    // the scale pin: thresholds ride broadcast aggregates — the plan has
    // NO analytic window (a global ntile would sort every user in one
    // partition)
    val plan = Analytics.eventsRfmOf(ev).queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "events_rfm must not use an analytic window")
  }

  test("events_rfm threshold branch reuses the per-user aggregate exchange (AQE)") {
    // the static plan shows the per-user aggregate twice (output branch +
    // threshold branch); at runtime AQE's exchange reuse dedups it — the
    // fact table materializes ONE user_id shuffle, the threshold pass
    // reads the reused stage. Query stages are leaves, so assert on the
    // ADAPTIVE executed plan's tree (SURVEY §5 AQE rule)
    val df = Analytics.eventsRfm(spark, sfDir)
    df.collect()
    val tree = df.queryExecution.executedPlan.treeString
    assert(tree.contains("ReusedExchange"),
      "threshold branch must reuse the per-user aggregate exchange, not recompute it")
  }

  test("multimodal_near_dup pairs on >=2 agreeing frames; hot bands defer to exact dedup") {
    // docs 1/2 identical (4 agreeing frames), doc 3 shares frames 0-1 with
    // them, doc 4 shares only frame 0 (below the >=2 threshold)
    val frames = Seq(
      (1L, 0, 10L, 100L), (1L, 1, 10L, 200L), (1L, 2, 10L, 300L), (1L, 3, 10L, 400L),
      (2L, 0, 10L, 100L), (2L, 1, 10L, 200L), (2L, 2, 10L, 300L), (2L, 3, 10L, 400L),
      (3L, 0, 10L, 100L), (3L, 1, 10L, 200L), (3L, 2, 10L, 999L), (3L, 3, 10L, 888L),
      (4L, 0, 10L, 100L), (4L, 1, 10L, 777L), (4L, 2, 10L, 666L), (4L, 3, 10L, 555L))
      .toDF("doc_id", "frame_idx", "frame_len", "checksum_cp")
    val out = Multimodal.multimodalNearDupOf(frames).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("n_match")))
    assert(out.toSet == Set((1L, 2L, 4L), (1L, 3L, 2L), (2L, 3L, 2L)))
    // capping the frame-0 band (4 members > 3) removes its contribution:
    // the 1-3 / 2-3 pairs fall to one agreeing frame and drop out, while
    // the exact-dup pair still matches on the remaining 3 frames — the
    // degenerate-band work belongs to multimodal_dedup's digest pass
    val capped = Multimodal.multimodalNearDupOf(frames, maxBucket = 3L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("n_match")))
    assert(capped.toSet == Set((1L, 2L, 3L)))
    // the cap rides the join's own band shuffle: at runtime AQE reuses the
    // frame-derivation exchange between the self-join sides (adaptive-tree
    // assertion per the SURVEY §5 AQE rule) — one frame pass, one shuffle
    val full = Multimodal.multimodalNearDup(spark, sfDir)
    full.collect()
    assert(full.queryExecution.executedPlan.treeString.contains("ReusedExchange"),
      "band self-join must reuse the frame-derivation exchange")
  }

  test("q_rank_funcs quartiles, percent_rank and cume_dist are positional on a total order") {
    val out = Analytics.qRankFuncs(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rows) =>
      val n = rows.length
      val sorted = rows.sortBy(r => (r.getAs[Long]("acctbal_e2"), r.getAs[Long]("c_custkey")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        // total order (no peers): percent_rank = i/(n-1), cume = (i+1)/n
        val expPct = if (n == 1) 0.0 else math.rint(i.toDouble / (n - 1) * 1e6) / 1e6
        val expCume = math.rint((i + 1).toDouble / n * 1e6) / 1e6
        assert(math.abs(r.getAs[Double]("pct_rank") - expPct) < 1e-9)
        assert(math.abs(r.getAs[Double]("cume") - expCume) < 1e-9)
      }
      // ntile(4) bucket sizes differ by at most one and are non-decreasing
      val tiles = sorted.map(_.getAs[Long]("quartile"))
      assert(tiles.toSeq == tiles.sorted.toSeq)
      val sizes = tiles.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
    }
  }
}
