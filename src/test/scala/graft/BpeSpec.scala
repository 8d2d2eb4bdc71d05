package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE learning + application vs an independent driver-side reference
  * implementation (the Sennrich ACL'16 algorithm in plain Scala), plus the
  * encoding's boundary/anchoring edge cases the `|sym~` scheme exists for. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- reference implementation: word-type BPE, overlapping pair counts,
  // ---- left-to-right non-overlapping merge application
  private def refPairCounts(vocab: Seq[(Vector[String], Long)]): Map[(String, String), Long] =
    vocab.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def refMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => w.map(_.toString).toVector -> f }
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = refPairCounts(vocab)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        merges += ((l, r, c))
        vocab = vocab.map { case (syms, f) => refMergeWord(syms, l, r) -> f }
        k += 1
      }
    }
    merges.result()
  }

  private def refTokens(word: String, merges: Seq[(String, String, Long)]): Int =
    merges.foldLeft(word.map(_.toString).toVector) { case (syms, (l, r, _)) =>
      refMergeWord(syms, l, r)
    }.length

  private def wordsOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase)).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }

  test("learnMerges matches the reference BPE exactly, counts included") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cats chatter that the hat is flat",
      "banana bandana banana",
      "low lower lowest newer newest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, 12)
    val want = refLearn(wordsOf(texts), 12)
    assert(got == want, s"merge tables differ:\n got  $got\n want $want")
  }

  test("corpusBpeApplyOf token counts match the reference application per doc") {
    val texts = Seq(
      "Banana, bandana! BANANA?",
      "aaaa aaa aa a",                  // same-symbol runs: L2R semantics
      "it has | and ~ in it",          // encoding delimiters in raw text
      "")                              // empty doc
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 8)
    val got = Bpe.corpusBpeApplyOf(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
      val wantChars = ws.map(_.length).sum.toLong
      val wantToks = ws.map(w => refTokens(w, merges)).sum.toLong
      assert(got(i.toLong) == ((wantChars, wantToks)),
        s"doc $i: got ${got(i.toLong)}, want ($wantChars, $wantToks)")
    }
  }

  test("a merge can never straddle a symbol boundary or eat a symbol prefix") {
    // construct the adversarial vocab directly: after merging (a,l) the
    // word "mall" holds [m,al,l] — a space-join encoding would then
    // mis-merge (l,l) across the [al][l] boundary; and pair (l,i) must
    // not eat the head of symbol "in" in [l,in]
    val docs = Seq(
      (1L, "al al al al mall mall lin lin"),
      (2L, "in in in lin")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 6)
    val want = refLearn(wordsOf(Seq(
      "al al al al mall mall lin lin", "in in in lin")), 6)
    assert(merges == want)
    val got = Bpe.corpusBpeApplyOf(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wantTok = Map(
      1L -> Seq("al", "al", "al", "al", "mall", "mall", "lin", "lin"),
      2L -> Seq("in", "in", "in", "lin"))
      .map { case (k, ws) => k -> ws.map(w => refTokens(w, merges)).sum.toLong }
    assert(got == wantTok)
  }

  test("corpusBpeVocabOf matches the reference symbol census with deterministic ranks") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cats chatter that the hat is flat",
      "banana bandana banana")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 8)
    val got = Bpe.corpusBpeVocabOf(docs, merges).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // reference census: apply merges per word occurrence, count symbols
    val refCounts = texts.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
      .flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r, _)) =>
          refMergeWord(syms, l, r)
        }
      }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val want = refCounts.toSeq.sortBy { case (s, n) => (-n, s) }.take(Bpe.VocabTopK)
      .zipWithIndex.map { case ((s, n), i) => (i + 1L, s, n) }
    assert(got == want, s"\n got  $got\n want $want")
  }

  test("corpusTokenizerFertilityOf matches the reference per-language sums") {
    val rows = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the cats chatter that the hat is flat"),
      (3L, "de", "banana bandana banana"),
      (4L, "de", ""))
    val docs = rows.toDF("doc_id", "lang", "text")
    val merges = Bpe.learnMerges(docs.select(col("doc_id"), col("text")), 8)
    val got = Bpe.corpusTokenizerFertilityOf(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val words = rs.flatMap(r => "[a-z]+".r.findAllIn(r._3.toLowerCase))
      val nw = words.size.toLong
      val nt = words.map(w => refTokens(w, merges)).sum.toLong
      val fert = nt * 100 / math.max(nw, 1L)
      assert(got(lang) == ((rs.size.toLong, nw, nt, fert)), s"$lang: ${got(lang)}")
    }
  }

  test("learning stops early when the corpus is fully merged") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // one word type of 2 chars: round 1 merges (a,b); round 2 has no
    // pairs left anywhere -> stop at 1 merge, not 5
    val merges = Bpe.learnMerges(docs, 5)
    assert(merges == Seq(("a", "b", 3L)))
  }

  test("randomized differential: spark learner equals reference on fuzzed corpora") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val alpha = "abcde"
      val texts = (0 until 20).map { _ =>
        (0 until rnd.nextInt(8)).map { _ =>
          (0 until (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        }.mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.learnMerges(docs, 10)
      val want = refLearn(wordsOf(texts), 10)
      assert(got == want, s"trial $trial:\n got  $got\n want $want")
    }
  }
}
