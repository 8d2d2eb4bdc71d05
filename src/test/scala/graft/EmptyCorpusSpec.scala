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

  test("every gate query emits SCALAR columns only (driver-sortable output)") {
    // the driver's correctness harness sorts the Spark output with pandas
    // sort_values, which cannot hash an array/struct/map cell — a nested
    // output column crashes the gate itself (embed_pca/embed_whiten in r7,
    // "unhashable type: numpy.ndarray"), recording err instead of a rows
    // count. Schema is data-independent, so the empty-tables build is the
    // cheap place to pin the rule for EVERY queries-map entry.
    val dir = Files.createTempDirectory("graft-empty-schema").toString
    graft.sources.Tables.names.foreach { n =>
      graft.sources.Tables.load(spark, sfDir, n).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-scalar gate output columns (driver-unsortable):\n${offenders.mkString("\n")}")
  }
}
