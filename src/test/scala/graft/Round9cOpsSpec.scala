package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Round-9c depth ops: leakage-safe splitting. */
class Round9cOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** 400 singleton docs + 50 planted dup pairs (i, i+1000): pair texts
    * differ by one trailing word, so they cluster via the n-gram edge,
    * not just the exact-hash edge. */
  private def plantedCorpus() = {
    val rnd = new scala.util.Random(13)
    def text(i: Int) = (0 until 30).map(_ => s"u${rnd.nextInt(50000)}_$i").mkString(" ")
    val singles = (100 until 500).map(i => (i.toLong, "en", "web", text(i)))
    val dups = (0 until 50).flatMap { i =>
      val t = text(i + 9000)
      Seq((i.toLong, "en", "web", t), (i + 1000L, "en", "web", t + " extra"))
    }
    (singles ++ dups).toDF("doc_id", "lang", "source", "text")
  }

  test("split_safe: no cluster ever straddles splits, and leak flags replay") {
    val out = TextAnalysis.corpusSplitSafeOf(plantedCorpus()).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.exists(_._2.length == 2), "fixture must form dup clusters")
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length == 1,
        s"cluster $c straddles splits")
    }
    // leak_fixed is exactly (multi-doc cluster && naive differs)
    out.foreach { r =>
      val multi = byCluster(r.getAs[Long]("cluster_id")).length > 1
      val expect = multi &&
        r.getAs[String]("naive_split") != r.getAs[String]("split")
      assert(r.getAs[Boolean]("leak_fixed") == expect, r.toString)
    }
    // the point of the op: the naive doc-grain split WOULD have leaked
    val fixed = out.count(_.getAs[Boolean]("leak_fixed"))
    assert(fixed >= 1, "planted dup pairs must expose at least one naive leak")
    // loose 80/10/10 at doc grain
    val n = out.length.toDouble
    val train = out.count(_.getAs[String]("split") == "train") / n
    assert(train > 0.65 && train < 0.95, s"train fraction $train out of band")
  }

  test("split_safe: singleton corpus degenerates to the naive split") {
    val docs = (0 until 120).map(i =>
      (i.toLong, "en", "web", (0 until 8).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "lang", "source", "text")
    TextAnalysis.corpusSplitSafeOf(docs).collect().foreach { r =>
      assert(r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id"))
      assert(r.getAs[String]("split") == r.getAs[String]("naive_split"))
      assert(!r.getAs[Boolean]("leak_fixed"))
    }
  }
}
