package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** text_unigram_logprob and corpus_dsir gate columns are per-element
  * round(ln(·)·10⁴) BIGINTs. Unlike sqrt, ln is not guaranteed correctly
  * rounded identically across engines, so a cross-engine hash gate is only
  * deterministic while no gate-corpus element lands within an ulp of a .5
  * scaled rounding boundary (the TemperedMixSpec discipline, applied to
  * the two ln-based gates). This spec enumerates EVERY distinct ln input
  * each gate evaluates on the gate corpora and pins a ≥1e-6 margin —
  * ~7 orders of magnitude wider than a 1-ulp disagreement at these
  * magnitudes — turning would-be data luck into a checked property. */
class LogGateMarginSpec extends SparkSpecBase {

  private val dirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def assertMargin(x: Double, what: String): Unit = {
    val frac = math.abs(x) - math.floor(math.abs(x))
    assert(math.abs(frac - 0.5) > 1e-6,
      s"$what = $x is within 1e-6 of a .5 rounding boundary")
  }

  test("unigram-logprob ln margins hold for every gate-corpus frequency") {
    for (dir <- dirs) {
      val tok = Tables.documents(spark, dir).select(
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
      val freqs = tok.groupBy(col("w")).count()
        .select(col("count")).distinct().collect().map(_.getLong(0))
      val total = tok.count().toDouble
      assert(freqs.nonEmpty)
      freqs.foreach { cnt =>
        assertMargin(math.log(cnt / total) * 10000.0, s"ln($cnt/$total)*1e4 ($dir)")
      }
    }
  }

  test("bigram-logprob ln margins hold for every gate-corpus count pair") {
    for (dir <- dirs) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val bg = Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
            .as(Seq("pos", "w")))
        .withColumn("w2", lead(col("w"), 1).over(w))
        .filter(col("w2").isNotNull)
      val freq2 = bg.groupBy(col("w"), col("w2")).count()
        .withColumnRenamed("count", "cnt2")
      val pairs = freq2.groupBy(col("w")).agg(sum(col("cnt2")).as("cnt1"))
        .join(freq2, "w")
        .select(col("cnt2"), col("cnt1")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty)
      pairs.foreach { case (c2, c1) =>
        assertMargin(math.log(c2.toDouble / c1) * 10000.0, s"ln($c2/$c1)*1e4 ($dir)")
      }
    }
  }

  test("entropy ln margins hold for every gate-corpus (char count, doc total) pair") {
    for (dir <- dirs) {
      val cnts = Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]"), lit(0))).as("c"))
        .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
      val pairs = cnts
        .withColumn("n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
        .select(col("cnt"), col("n")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty)
      pairs.foreach { case (cnt, n) =>
        assertMargin(math.log(n.toDouble / cnt) * 10000.0, s"ln($n/$cnt)*1e4 ($dir)")
      }
    }
  }

  test("tfidf ln margins hold for every gate-corpus document frequency") {
    for (dir <- dirs) {
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count().toDouble
      val dfs = docs.select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
        .distinct().groupBy(col("w")).count()
        .select(col("count")).distinct().collect().map(_.getLong(0))
      assert(dfs.nonEmpty)
      dfs.foreach { df =>
        assertMargin(math.log(nDocs / df) * 10000.0, s"ln($nDocs/$df)*1e4 ($dir)")
      }
    }
  }

  test("bm25 contribution margins hold for every gate-corpus (tf, dl, df)") {
    import graft.operators.CorpusStats
    for (dir <- dirs) {
      val docs = Tables.documents(spark, dir)
      val n = docs.count().toDouble
      val tok = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val tot = tok.count().toDouble
      val tf = tok.filter(col("w").isin(CorpusStats.Bm25Query: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val triples = tf.join(dfr, "w").join(dl, "doc_id")
        .select(col("tf"), col("dl"), col("df")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(triples.nonEmpty)
      triples.foreach { case (tfv, dlv, dfv) =>
        val c = math.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0) * (tfv * 2.2) /
          (tfv + 1.2 * (1.0 - 0.75 + 0.75 * (dlv * n / tot))) * 10000.0
        assertMargin(c, s"bm25(tf=$tfv, dl=$dlv, df=$dfv)*1e4 ($dir)")
      }
    }
  }

  test("cell-topics ln margins hold for every gate-corpus cell frequency") {
    for (dir <- dirs) {
      val cellCol = (0 until 8).map(b =>
        when(element_at(col("embedding"), b + 1) >= 0, 1L << b).otherwise(0L))
        .reduce(_ + _)
      val cells = Tables.embeddings(spark, dir)
        .select(col("vec_id"), cellCol.as("cell"))
      val ctf = Tables.documents(spark, dir)
        .join(cells, col("doc_id") === col("vec_id"))
        .select(col("cell"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
        .groupBy(col("cell"), col("w")).count()
      val nCells = ctf.select(col("cell")).distinct().count().toDouble
      val dfs = ctf.groupBy(col("w")).count()
        .select(col("count")).distinct().collect().map(_.getLong(0))
      assert(dfs.nonEmpty)
      dfs.foreach { df =>
        assertMargin(math.log(nCells / df) * 10000.0, s"ln($nCells/$df)*1e4 ($dir)")
      }
    }
  }

  test("cluster-topics TWIN ln margins hold for every seed-cell frequency") {
    // the r12 twin's cells are the seed-argmax assignment, so its
    // (n_cells, df_cells) inputs to round(ln(·)·1e4) differ from the
    // sign-bit sibling's — pin the margins for the twin's actual inputs
    for (dir <- dirs) {
      val cells = graft.operators.CorpusStats.clusterTopicsOracleCells(spark, dir)
      val ctf = Tables.documents(spark, dir)
        .join(cells, col("doc_id") === col("vec_id"))
        .select(col("cell"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
        .groupBy(col("cell"), col("w")).count()
      val nCells = ctf.select(col("cell")).distinct().count().toDouble
      val dfs = ctf.groupBy(col("w")).count()
        .select(col("count")).distinct().collect().map(_.getLong(0))
      assert(dfs.nonEmpty)
      dfs.foreach { df =>
        assertMargin(math.log(nCells / df) * 10000.0, s"twin ln($nCells/$df)*1e4 ($dir)")
      }
    }
  }

  test("pmi ln margins hold for every filtered gate-corpus bigram") {
    for (dir <- dirs) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val bg = Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
            .as(Seq("pos", "w")))
        .withColumn("w2", lead(col("w"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col("w").as("w1"), col("w2"))
      val c12 = bg.groupBy(col("w1"), col("w2")).count()
        .withColumnRenamed("count", "c12").cache()
      val left = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val right = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
      val n = c12.agg(sum(col("c12"))).collect()(0).getLong(0)
      val rows = c12.filter(col("c12") >= 3)
        .join(left, "w1").join(right, "w2")
        .select(col("c12"), col("c1"), col("c2")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      c12.unpersist()
      assert(rows.nonEmpty)
      rows.foreach { case (c12v, c1, c2) =>
        assertMargin(math.log((c12v.toDouble * n) / (c1.toDouble * c2)) * 10000.0,
          s"pmi($c12v,$c1,$c2,$n)*1e4 ($dir)")
      }
    }
  }

  test("dsir ln margins hold for every gate-corpus bucket ratio") {
    for (dir <- dirs) {
      val tok = Tables.documents(spark, dir).select(col("lang"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
        .select(col("lang"),
          pmod(call_function("char_poly_hash", col("w")), lit(512L)).as("b"))
      val stats = tok.groupBy(col("b")).agg(
        count(lit(1)).as("rcnt"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tcnt"))
        .collect().map(r => (r.getAs[Long]("tcnt"), r.getAs[Long]("rcnt")))
      val rtot = stats.map(_._2).sum.toDouble + 512.0
      val ttot = stats.map(_._1).sum.toDouble + 512.0
      assert(stats.nonEmpty)
      stats.foreach { case (tcnt, rcnt) =>
        val x = math.log(((tcnt + 1).toDouble * rtot) / ((rcnt + 1).toDouble * ttot)) * 10000.0
        assertMargin(x, s"dsir bucket ln((${tcnt + 1}·$rtot)/(${rcnt + 1}·$ttot))*1e4 ($dir)")
      }
    }
  }
}
