package graft

import java.nio.file.Files

class EmptyCorpusSpec extends SparkSpecBase {

  test("every gate query tolerates completely empty tables") {
    // a library operator must not crash on an empty partition of the world:
    // empty ingestion windows, freshly-created corpora and filtered-to-zero
    // inputs are everyday states at scale, and driver-side seeding logic
    // (quantizer samples, broadcast counts, min/max aggregates) is exactly
    // where empty inputs turn into head()/NPE crashes
    val dir = Files.createTempDirectory("graft-empty").toString
    graft.sources.Tables.names.foreach { n =>
      graft.sources.Tables.load(spark, sfDir, n).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> scala.util.Try(fn(spark, dir).count())
    }
    val failures = results.collect {
      case (n, scala.util.Failure(e)) =>
        s"$n: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}"
    }
    assert(failures.isEmpty,
      s"queries crashed on empty tables:\n${failures.mkString("\n")}")
    // and they all return zero-or-more rows, never garbage counts
    results.foreach { case (n, t) => assert(t.get >= 0L, n) }
  }
}
