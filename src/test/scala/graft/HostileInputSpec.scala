package graft

import org.apache.spark.sql.DataFrame

/** Hostile-input sweep for the doc-local text operators: real web corpora
  * carry CRLF line endings, zero-width/emoji unicode, unterminated markup,
  * single-line megadocs and whitespace-only texts — none of which may
  * crash a pass or emit rule-violating signals (bp columns beyond 10⁴,
  * negative counts). Complements EmptyCorpusSpec's empty-table sweep with
  * adversarial CONTENT. */
class HostileInputSpec extends SparkSpecBase {
  import graft.operators.{CorpusStats, Dedup}

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val hostile = Seq(
    1L -> "line one\r\nline two\r\n- bullet\r\n",       // CRLF endings
    2L -> ("x" * 100000),                                // one huge token/line
    3L -> "☃​​🎉 emoji and zero-width only",   // unicode soup
    4L -> "   \t  \n \t ",                               // whitespace only
    5L -> "<div><p>unterminated <a href=",               // broken markup
    6L -> ("&amp;" * 5000),                              // entity flood
    7L -> "normal words here with the and that ok fine") // control doc

  test("doc-local passes survive hostile content with in-range signals") {
    val docs = docsDf(hostile)
    val passes: Seq[(String, DataFrame)] = Seq(
      "gopher" -> CorpusStats.corpusGopherFilterOf(docs),
      "ttr" -> CorpusStats.textTtrOf(docs),
      "code" -> CorpusStats.textCodeDetectOf(docs),
      "markup" -> CorpusStats.textMarkupDetectOf(docs),
      "line_dedup" -> Dedup.corpusLineDedupOf(docs),
      "bpe_apply" -> graft.operators.Bpe.corpusBpeApplyOf(docs,
        graft.operators.Bpe.learnMerges(docs, 4)),
      "datacard" -> CorpusStats.corpusDatacardOf(
        docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))))
    passes.foreach { case (name, df) =>
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name emitted nothing")
      rows.foreach { r =>
        r.schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (f.name.endsWith("_bp") && !r.isNullAt(i)) {
            val v = r.getLong(i)
            assert(v >= 0L && v <= 10000L, s"$name.${f.name} = $v out of [0, 10000]")
          }
          if ((f.name.startsWith("n_") || f.name == "value") && !r.isNullAt(i)
              && f.dataType == org.apache.spark.sql.types.LongType) {
            assert(r.getLong(i) >= 0L, s"$name.${f.name} negative")
          }
        }
      }
    }
  }

  test("hostile docs classify sanely: megatoken is not prose, entity flood is markup") {
    val docs = docsDf(hostile)
    val gopher = CorpusStats.corpusGopherFilterOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap
    assert(gopher(2L) == 0L, "a 100k-char single token fails word-count/word-length rules")
    assert(gopher(4L) == 0L, "whitespace-only fails")
    val markup = CorpusStats.textMarkupDetectOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("is_markup")).toMap
    assert(markup(6L) == 1L, "an entity flood must flag as markup")
    assert(markup(7L) == 0L)
    // CRLF: the \r stays inside the line content (we split on \n only) —
    // the bullet detector must still see the bullet through the \r-free
    // line START, and counts must be consistent
    val g1 = CorpusStats.corpusGopherFilterOf(docsDf(Seq(1L -> "a\r\n- b\r\nc")))
      .head()
    assert(g1.getAs[Long]("n_lines") == 3L)
    assert(g1.getAs[Long]("bullet_bp") == 3333L)
  }
}
