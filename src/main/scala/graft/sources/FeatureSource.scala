package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch feature sources, mirroring the reference's DataSource spec
  * (reference: core/src/main/java/feast/core/model/DataSource.java —
  * FileOptions/format, field_mapping, event_timestamp_column,
  * created_timestamp_column, date_partition_column).
  *
  * `fieldMapping` renames source columns to feature names; `eventTsCol` /
  * `createdTsCol` name the (post-mapping) timestamp columns; a
  * `datePartitionCol` lets time-range loads prune partitions at the source
  * (the filter lands on the partition column, so at cluster scale the scan
  * skips whole directories).
  */
final case class BatchSource(
    path: String,
    format: String = "parquet", // parquet | csv | json | orc | avro*
                                // (*avro needs the spark-avro module on
                                // the cluster classpath; error is eager)
    fieldMapping: Map[String, String] = Map.empty,
    eventTsCol: String = "event_timestamp",
    createdTsCol: Option[String] = None,
    datePartitionCol: Option[String] = None,
    eventTsUnit: String = "micros") // unit of integer event timestamps:
                                    // seconds | millis | micros | nanos

object BatchSource {

  /** Read the full source with field mapping + timestamp normalization. */
  def read(spark: SparkSession, src: BatchSource): DataFrame = {
    // tolerate TIMESTAMP(NANOS) parquet (read as long, converted below)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = src.format match {
      case "parquet" => spark.read.parquet(src.path)
      case "csv"     => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(src.path)
      case "json"    => spark.read.json(src.path)
      case "orc"     => spark.read.orc(src.path)
      case "avro"    => spark.read.format("avro").load(src.path)
      case other     => throw new IllegalArgumentException(s"unknown format: $other")
    }
    val mapped = src.fieldMapping.foldLeft(raw) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    // tolerate string/long-epoch-typed event timestamps from csv/json
    val ts = mapped.schema(src.eventTsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => mapped
      case org.apache.spark.sql.types.LongType =>
        val c = col(src.eventTsCol)
        val asTs = src.eventTsUnit match {
          case "seconds" => timestamp_seconds(c)
          case "millis"  => timestamp_millis(c)
          case "micros"  => timestamp_micros(c)
          case "nanos"   => timestamp_micros(expr(s"${src.eventTsCol} div 1000"))
          case other => throw new IllegalArgumentException(s"unknown ts unit: $other")
        }
        mapped.withColumn(src.eventTsCol, asTs)
      case _ =>
        mapped.withColumn(src.eventTsCol, to_timestamp(col(src.eventTsCol)))
    }
    ts
  }

  /** Read restricted to event time ∈ [start, end) — with the range filter
    * also applied to the date-partition column when one is declared, so the
    * source can prune partitions/files before scanning. */
  def readRange(spark: SparkSession, src: BatchSource,
                startInclusive: String, endExclusive: String): DataFrame = {
    val df = read(spark, src)
      .filter(col(src.eventTsCol) >= lit(startInclusive) &&
              col(src.eventTsCol) < lit(endExclusive))
    src.datePartitionCol match {
      case Some(p) =>
        df.filter(col(p) >= to_date(lit(startInclusive)) &&
                  col(p) <= to_date(lit(endExclusive)))
      case None => df
    }
  }
}
