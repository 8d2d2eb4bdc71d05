package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, Growth, Similarity}

/** Round-9f depth ops: second-domain graph gates, CUPED, matryoshka. */
class Round9fOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("graphComponentsOf labels co-activity islands and isolated users") {
    // two islands that never share an hour, plus one isolated user:
    //   island A = {1, 2, 3}: 1+2 co-active in hour H0, 2+3 in hour H1
    //     (so 1~3 only transitively — the closure matters, not the edge)
    //   island B = {10, 11}: co-active in hour H2
    //   user 99: active alone in hour H3
    val ev = Seq(
      (1L, ts("2024-01-01 00:05:00")), (2L, ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 01:05:00")), (3L, ts("2024-01-01 01:10:00")),
      (10L, ts("2024-01-01 02:05:00")), (11L, ts("2024-01-01 02:10:00")),
      (99L, ts("2024-01-01 03:05:00")))
      .toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
    val out = GraphOps.graphComponentsOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (99L, 99L, 1L)))
  }

  test("graphComponents one giant hour stays capped at top-20 per hour") {
    // 30 users all active in ONE hour: the pair join must see at most
    // C(20,2) pairs (the cap is the scale contract), and the 20 capped
    // users form one component; the 10 uncapped ones are singletons.
    // Cap keeps the TOP-20 by activity count (ties by user_id): give
    // users 1..20 two events each so the kept set is deterministic.
    val rows = (1L to 30L).flatMap { u =>
      val base = Seq((u, ts("2024-01-01 05:01:00")))
      if (u <= 20L) base :+ ((u, ts("2024-01-01 05:02:00"))) else base
    }
    val ev = rows.toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
    val out = GraphOps.graphComponentsOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (capped, rest) = out.partition(_._1 <= 20L)
    assert(capped.forall { case (_, c, s) => c == 1L && s == 20L })
    assert(rest.forall { case (u, c, s) => c == u && s == 1L })
  }

  test("eventsCuped: constant covariate means zero theta, cuped == raw") {
    // every user has exactly one pre-period event (x constant), so
    // var(x) = 0 and cov(x,y) = 0 EXACTLY in the integer moments —
    // theta_e6 must be 0 and the adjustment a no-op, whatever the arms.
    val ev = (1L to 30L).flatMap { u =>
      Seq((u, ts("2024-01-01 10:00:00"), "view")) ++
        (if (u % 3 == 0) Seq((u, ts("2024-01-25 10:00:00"), "purchase"))
         else Seq((u, ts("2024-01-25 10:00:00"), "view")))
    }.toDF("user_id", "ts", "event_type")
    val r = Growth.eventsCupedOf(ev).collect().head
    assert(r.getAs[Long]("theta_e6") == 0L)
    assert(r.getAs[Long]("cuped_lift_e6") == r.getAs[Long]("lift_e6"))
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 30L)
  }

  test("eventsCuped: perfectly predictive covariate cancels the lift exactly") {
    // y_i = x_i for every user (conversion iff any pre-period activity):
    // cov(x,y) = var(x) exactly, so theta_e6 = 1e6 exactly, the arm-mean
    // covariate gap equals the raw lift (lift_e6 == dx_e6), and the CUPED
    // lift collapses to EXACTLY zero — the whole point of the adjustment,
    // pinned without reference to which arm each user hashes into.
    val ev = (1L to 40L).flatMap { u =>
      if (u % 2 == 0)
        Seq((u, ts("2024-01-01 10:00:00"), "view"),
          (u, ts("2024-01-25 10:00:00"), "purchase"))
      else
        Seq((u, ts("2024-01-25 10:00:00"), "view"))
    }.toDF("user_id", "ts", "event_type")
    val r = Growth.eventsCupedOf(ev).collect().head
    assert(r.getAs[Long]("theta_e6") == 1000000L)
    assert(r.getAs[Long]("lift_e6") == r.getAs[Long]("dx_e6"))
    assert(r.getAs[Long]("cuped_lift_e6") == 0L)
  }

  test("eventsPowerCurve: window cut, multi-event days, dense k grid") {
    // corpus max day = 2024-02-01. user 1: 3 distinct active days (one
    // day has two events — days, not events, are counted); user 2: 1
    // active day ON the window boundary (d1-27, the oldest day in);
    // user 3: active only OUTSIDE the window (excluded entirely).
    val ev = Seq(
      (1L, ts("2024-02-01 10:00:00")), (1L, ts("2024-02-01 11:00:00")),
      (1L, ts("2024-01-30 10:00:00")), (1L, ts("2024-01-20 10:00:00")),
      (2L, ts("2024-01-05 10:00:00")),
      (3L, ts("2023-12-01 10:00:00")))
      .toDF("user_id", "ts")
    val out = Growth.eventsPowerCurveOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size == 28 && out.map(_._1) == (1L to 28L))
    assert(out.toMap.getOrElse(3L, -1L) == 1L, "user 1 at k=3")
    assert(out.toMap.getOrElse(1L, -1L) == 1L, "user 2 at k=1 (boundary day in)")
    assert(out.map(_._2).sum == 2L, "user 3 outside the window")
  }

  test("knnMatryoshka: planted prefix-blind corpus reads recall 0 then 100") {
    // query 0 = e1. five "good" candidates (15..19) share direction
    // (1, 0.2, 0, 0): full cosine ≈ .98. five "bad" candidates (10..14)
    // are (1, 0, 99, 0): full cosine ≈ .01 but PREFIX-2 cosine = 1.0 —
    // the first two dims cannot see the poison in dim 3. Top-5 under the
    // 2-dim prefix is exactly the bad set, top-5 full exactly the good
    // set: recall@5 must read 0 at d=2 and 100 (the self-check) at d=4.
    val emb = (Seq((0L, Array(1f, 0f, 0f, 0f))) ++
      (10L to 14L).map(i => (i, Array(1f, 0f, 99f, 0f))) ++
      (15L to 19L).map(i => (i, Array(1f, 0.2f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnMatryoshkaOf(emb, Seq((2, 0L), (4, 0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((2L, 0L), (4L, 100L)))
  }

  test("knnMatryoshka floors drop a failing prefix row (the gate contract)") {
    val emb = (Seq((0L, Array(1f, 0f, 0f, 0f))) ++
      (10L to 14L).map(i => (i, Array(1f, 0f, 99f, 0f))) ++
      (15L to 19L).map(i => (i, Array(1f, 0.2f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnMatryoshkaOf(emb, Seq((2, 50L), (4, 100L)))
      .collect().map(r => r.getLong(0)).toSeq
    assert(out == Seq(4L), "the d=2 row (recall 0 < floor 50) must vanish")
  }

  test("graphHarmonicOf: exact harmonic terms on a path graph + isolate") {
    // path A-B-C-D, isolated E; equal weights keep every edge under the
    // mean threshold. H(A) = 1e6/1 + 1e6/2 + 1e6/3 (truncating DIV per
    // term), H(B) = 1e6 + 1e6 + 1e6/2; E reaches nothing.
    val nodes = Seq("A", "B", "C", "D", "E").toDF("node")
    val edges = Seq(("A", "B", 10L), ("B", "C", 10L), ("C", "D", 10L))
      .toDF("src", "dst", "w")
    val byNode = GraphOps.graphHarmonicOf(nodes, edges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byNode("A") == ((3L, 1000000L + 500000L + 333333L)))
    assert(byNode("B") == ((3L, 1000000L + 1000000L + 500000L)))
    assert(byNode("C") == byNode("B"), "symmetry of the path")
    assert(byNode("D") == byNode("A"))
    assert(byNode("E") == ((0L, 0L)), "isolate contributes zero, not null")
  }

  test("qSkylineOf: hand skyline with same-price/same-size dominance edges") {
    import graft.operators.AnalyticsJoins
    // pairs: (1.00, 5) kept; (1.00, 3) dominated same-price-bigger;
    // (1.50, 5) dominated cheaper-equal-size; (2.00, 10) kept ×2 parts;
    // (3.00, 10) dominated cheaper-equal-size
    val part = Seq((1.00, 5), (1.00, 3), (1.50, 5), (2.00, 10), (2.00, 10),
      (3.00, 10))
      .zipWithIndex
      .map { case ((p, s), i) => (i.toLong, s, p) }
      .toDF("p_partkey", "p_size", "p_retailprice")
    val out = AnalyticsJoins.qSkylineOf(part)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((100L, 5L, 1L), (200L, 10L, 2L)))
  }

  test("qSkylineOf equals brute-force dominance on randomized catalogs") {
    import graft.operators.AnalyticsJoins
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val pts = (1 to 200).map(i =>
        (i.toLong, 1 + rnd.nextInt(50), (1 + rnd.nextInt(400)) / 100.0 * 1.0))
      val part = pts.toDF("p_partkey", "p_size", "p_retailprice")
      val got = AnalyticsJoins.qSkylineOf(part)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over distinct pairs
      val pairs = pts.map { case (_, s, p) => (math.round(p * 100), s.toLong) }.distinct
      val want = pairs.filter { case (pc, sz) =>
        !pairs.exists { case (oc, os) =>
          oc <= pc && os >= sz && (oc < pc || os > sz) }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("corpusBm25Of ranks by tf, penalizes length, drops no-hit docs") {
    import graft.operators.CorpusStats
    val docs = Seq(
      // doc 1: "fox" twice in a short doc — top hit
      (1L, "en", "w", "fox fox jumps high"),
      // doc 2: "fox" twice but buried in 40 filler tokens — the length
      // penalty (b=0.75, dl ≈ 3×avgdl) outweighs the extra occurrence
      // and BM25 ranks it BELOW the short single-hit doc; hand-check:
      // tfc(2, dl=42) ≈ 0.85 < tfc(1, dl=2) ≈ 1.53
      (2L, "en", "w", "fox fox " + Seq.fill(40)("filler").mkString(" ")),
      // doc 3: "fox" once in two tokens — above the long doc, below doc 1
      (3L, "en", "w", "fox sleeps"),
      // doc 4: no query term — absent from the ranking
      (4L, "en", "w", "nothing relevant here at all"))
      .toDF("doc_id", "lang", "source", "text")
    val out = CorpusStats.corpusBm25Of(docs, Seq("fox"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(_._2) == Seq(1L, 3L, 2L),
      "tf wins at equal length; saturation + length penalty beats raw tf")
    assert(out.map(_._1) == Seq(1L, 2L, 3L), "dense ranks from 1")
  }

  test("graphKcoreOf: clique core survives, low-degree periphery peels") {
    import graft.operators.GraphOps
    // K4 clique {A,B,C,D} + pendant E on A: the 3-core is exactly the
    // clique (each member keeps 3 in-core partners); E peels round 1 and
    // A's degree drops 4→3 but stays.
    val nodes = Seq("A", "B", "C", "D", "E").toDF("node")
    val edges = Seq(("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"),
      ("B", "D"), ("C", "D"), ("A", "E"))
      .map { case (a, b) => (a, b, 10L) }.toDF("src", "dst", "w")
    val out = GraphOps.graphKcoreOf(nodes, edges, 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(Seq("A", "B", "C", "D").forall(n => out(n) == ((1L, 3L))))
    assert(out("E") == ((0L, 0L)))
  }

  test("graphKcoreOf: peel cascades through a path to the empty core") {
    import graft.operators.GraphOps
    // path A-B-C-D-E with k=2: endpoints peel, the cascade re-exposes new
    // endpoints each round until nothing is left — exercises multi-round
    // convergence, not a single pass.
    val nodes = Seq("A", "B", "C", "D", "E").toDF("node")
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"))
      .map { case (a, b) => (a, b, 10L) }.toDF("src", "dst", "w")
    val out = GraphOps.graphKcoreOf(nodes, edges, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out.forall(_ == ((0L, 0L))), "cascade empties the 2-core of a path")
    // and a 5-cycle with k=2 survives whole (every node keeps exactly 2)
    val ring = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("E", "A"))
      .map { case (a, b) => (a, b, 10L) }.toDF("src", "dst", "w")
    val out2 = GraphOps.graphKcoreOf(nodes, ring, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out2.forall(_ == ((1L, 2L))))
  }

  test("coActivityLabels artifact matches the live derivation and refreshes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-art").toString
    def writeEvents(extra: Boolean): Unit = {
      val base = Seq(
        (1L, ts("2024-01-01 00:05:00"), 1L),
        (2L, ts("2024-01-01 00:10:00"), 2L),
        (9L, ts("2024-01-01 05:00:00"), 3L))
      val rows = if (extra) base :+ ((2L, ts("2024-01-01 05:01:00"), 4L)) else base
      rows.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    writeEvents(extra = false)
    val art = GraphOps.coActivityLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(art == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
    // refresh: user 2 now co-occurs with 9 in hour 5 — one component
    writeEvents(extra = true)
    val art2 = GraphOps.coActivityLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(art2 == Map(1L -> 1L, 2L -> 1L, 9L -> 1L),
      "refreshed events re-derive instead of serving the stale artifact")
  }

  test("corpusSoftDedup weights preserve one doc's mass per cluster") {
    // cluster {1,2} → 5000 bp each; singleton {3} → 10000 bp
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val out = graft.operators.Dedup.corpusSoftDedupLabeled(labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 1L, 2L, 5000L), (2L, 1L, 2L, 5000L),
      (3L, 3L, 1L, 10000L)))
  }

  test("knnHammingOf: exact popcount ranking incl. the top sign bit") {
    // query 0: all-positive signs. candidates flip a known number of
    // dims negative: 10 → hamming 1 (ONLY dim 64 — the hi half's top
    // bit, the packing edge), 11 → 2, 12 → 5, 13 → 0 (identical signs).
    def vec(flips: Set[Int]): Array[Float] =
      (0 until 64).map(i => if (flips(i)) -1f else 1f).toArray
    val emb = Seq(
      (0L, vec(Set.empty[Int])),
      (10L, vec(Set(63))),
      (11L, vec(Set(0, 31))),
      (12L, vec(Set(1, 2, 3, 32, 62))),
      (13L, vec(Set.empty[Int])))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnHammingOf(emb)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 13L, 0L), (2L, 10L, 1L), (3L, 11L, 2L), (4L, 12L, 5L)))
  }

  test("eventsAttributionMarkov: exact removal effects on a hand chain") {
    // u1: click → purchase; u2: view → (no purchase).
    // p(START→click) = p(START→view) = 500000; click→CONV and view→NULL
    // are certain. Base absorption = 500000. Removing click redirects its
    // inflow to NULL (effect 500000); removing view changes nothing on
    // the converting path (effect 0). Shares: 10000 / 0 bp.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "purchase"),
      (2L, ts("2024-01-01 11:00:00"), 3L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Growth.eventsAttributionMarkovOf(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("click", 500000L, 500000L, 10000L),
      ("view", 0L, 500000L, 0L)))
  }

  test("eventsAttributionMarkov truncates journeys at the first purchase") {
    // u3's trailing "view, purchase" after the first purchase must not
    // create transitions: with u1 and u2 present, START→click carries 2
    // of 3 journeys → base = 666666 (truncating e6), all of it on click.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "purchase"),
      (2L, ts("2024-01-01 11:00:00"), 3L, "view"),
      (3L, ts("2024-01-02 09:00:00"), 4L, "click"),
      (3L, ts("2024-01-02 09:01:00"), 5L, "purchase"),
      (3L, ts("2024-01-02 09:02:00"), 6L, "view"),
      (3L, ts("2024-01-02 09:03:00"), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val byCh = Growth.eventsAttributionMarkovOf(ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCh("click") == ((666666L, 666666L)))
    assert(byCh("view") == ((0L, 666666L)))
  }

  test("corpusCurate: every reason class fires on a hand corpus") {
    import graft.operators.CorpusStats
    // gopher-passing filler: ≥50 words, stopword-bearing, 3-10 mean wlen;
    // every non-stopword carries the seed so no 5-word run repeats across
    // seeds (a shared template would contaminate every doc against the
    // benchmark doc)
    def good(seed: String): String = (1 to 7).map(i =>
      s"the ${seed}a$i of ${seed}b$i and ${seed}c$i that ${seed}d$i with ${seed}e$i")
      .mkString(" ")
    val bench = good("bench")
    val docs = Seq(
      (0L, "en", "s0", bench),                       // 0 % 97 == 0: benchmark
      (1L, "en", "s1", good("alpha")),               // clean keeper
      (2L, "en", "s2", "too short"),                 // fails the gopher rules
      (3L, "en", "s3", good("dupe")),                // exact-dup pair: 3 is the
      (4L, "en", "s3", good("dupe")),                //   keeper, 4 the duplicate
      // shares an 8-word run with the benchmark doc but lives in another
      // source (no dedup edge — blocking is (lang, source)): contaminated
      (5L, "en", "s5", bench.split(" ").take(8).mkString(" ") + " " + good("gamma")))
      .toDF("doc_id", "lang", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-curate").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusStats.corpusCurate(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(6), r.getLong(5))).toMap
    assert(out(0L) == (("benchmark", 0L)))
    assert(out(1L) == (("kept", 1L)))
    assert(out(2L) == (("quality", 0L)))
    assert(out(3L) == (("kept", 1L)), "cluster representative survives")
    assert(out(4L) == (("duplicate", 0L)))
    assert(out(5L) == (("contaminated", 0L)))
  }

  test("clusterLabels artifact: derive-once, fingerprint-keyed re-derive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cl-art").toString
    def writeDocs(extra: Boolean): Unit = {
      val base = Seq(
        (1L, "en", "web", "the quick brown fox jumps over the lazy dog"),
        (2L, "en", "web", "the quick brown fox jumps over the lazy dog"),
        (3L, "en", "web", "something entirely different lives here today"))
      val docs = if (extra)
        base :+ ((4L, "en", "web", "a brand new document arrives in the corpus"))
      else base
      docs.toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    writeDocs(extra = false)
    val first = graft.operators.Dedup.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // exact dup 1↔2 clusters under min id 1; the live derivation agrees
    assert(first(2L) == 1L && first(1L) == 1L && first(3L) == 3L)
    val live = graft.operators.Dedup
      .dedupClusters(spark, dir) // gate path = artifact read
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(live == first)
    // corpus refresh (different file size) must invalidate the artifact
    writeDocs(extra = true)
    val second = graft.operators.Dedup.clusterLabels(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert(second == Set(1L, 2L, 3L, 4L),
      "refreshed corpus re-derives instead of serving the stale artifact")
  }
}
