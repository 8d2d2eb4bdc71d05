package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{BatchSource, Tables}

class FeatureSourceSpec extends SparkSpecBase {

  test("csv and json sources round-trip the parquet events with field mapping") {
    val dir = Files.createTempDirectory("graft-src").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    ev.withColumnRenamed("ts", "event_time")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    ev.withColumnRenamed("ts", "event_time")
      .write.mode("overwrite").json(s"$dir/json")

    for (fmt <- Seq("csv", "json")) {
      val src = BatchSource(s"$dir/$fmt", fmt,
        fieldMapping = Map("event_time" -> "ts"), eventTsCol = "ts")
      val back = BatchSource.read(spark, src)
      assert(back.count() == ev.count(), s"$fmt count")
      val joined = back.select(col("event_id"), col("ts").as("ts2"))
        .join(ev, "event_id")
        // csv/json keep only millis-level text by default; compare to millis
        .filter(abs(unix_millis(col("ts2")) - unix_millis(col("ts"))) > 1)
      assert(joined.count() == 0, s"$fmt timestamps differ")
    }
  }

  test("orc sources round-trip exactly; avro fails eagerly without the module") {
    val dir = Files.createTempDirectory("graft-src-orc").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    ev.withColumnRenamed("ts", "event_time")
      .write.mode("overwrite").orc(s"$dir/orc")
    val back = BatchSource.read(spark, BatchSource(s"$dir/orc", "orc",
      fieldMapping = Map("event_time" -> "ts"), eventTsCol = "ts"))
    assert(back.count() == ev.count())
    // orc keeps full timestamp precision — exact equality, unlike csv/json
    val joined = back.select(col("event_id"), col("ts").as("ts2"))
      .join(ev, "event_id")
      .filter(col("ts2") =!= col("ts"))
    assert(joined.count() == 0, "orc timestamps must round-trip exactly")
    // avro needs the external spark-avro module; absent here, the error
    // must surface at read() time, not as a mid-job task failure
    intercept[Throwable] {
      BatchSource.read(spark, BatchSource(s"$dir/orc", "avro", eventTsCol = "ts"))
    }
  }

  test("stream source specs render/parse round-trip (incl. field mapping)") {
    import graft.model._
    val specs: Seq[StreamSourceSpec] = Seq(
      KafkaSourceSpec("b1:9092,b2:9092", "events", StreamFormat.ProtoFormat("com.example.Row"),
        eventTsCol = "ts", fieldMapping = Map("event_time" -> "ts", "v" -> "value")),
      KafkaSourceSpec("b:9092", "t", StreamFormat.AvroFormat("{}")),
      KinesisSourceSpec("us-east-1", "stream", StreamFormat.AvroFormat()),
      FileStreamSourceSpec("/data/in", "parquet", "ts", Map("a" -> "b")))
    specs.foreach { s =>
      assert(StreamSourceSpec.parse(s.render) == s, s"round-trip failed for $s")
    }
    assertThrows[IllegalArgumentException](StreamSourceSpec.parse("pulsar|x|y"))
  }

  test("StreamIngest.readStreamSource executes file specs, rejects broker specs") {
    import graft.model._
    import graft.streaming.StreamIngest
    val dir = Files.createTempDirectory("graft-streamsrc").toString
    val ev = Tables.events(spark, sfDir).limit(100)
      .select(col("event_id"), col("ts").as("event_time"), col("user_id"), col("value"))
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val spec = FileStreamSourceSpec(s"$dir/in", "parquet", "ts",
      fieldMapping = Map("event_time" -> "ts"))
    val stream = StreamIngest.readStreamSource(spark, spec, ev.schema)
    assert(stream.isStreaming && stream.columns.contains("ts"))
    val q = stream.writeStream.format("memory").queryName("src_out")
      .option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("src_out").count() == 100)
    assertThrows[UnsupportedOperationException](StreamIngest.readStreamSource(spark,
      KafkaSourceSpec("b:9092", "t", StreamFormat.AvroFormat()), ev.schema))
    assertThrows[UnsupportedOperationException](StreamIngest.readStreamSource(spark,
      KinesisSourceSpec("us-east-1", "s", StreamFormat.AvroFormat()), ev.schema))
  }

  test("readRange bounds event time [start, end)") {
    // note: the raw driver events.parquet is TIMESTAMP(NANOS) and must go
    // through Tables.events; BatchSource targets normal micro parquet
    val dir = Files.createTempDirectory("graft-range").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(s"$dir/events")
    val src = BatchSource(s"$dir/events", "parquet", eventTsCol = "ts")
    val df = BatchSource.readRange(spark, src, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val bad = df.filter(col("ts") < "2024-01-10 00:00:00" || col("ts") >= "2024-01-20 00:00:00")
    assert(df.count() > 0 && bad.count() == 0)
  }
}
