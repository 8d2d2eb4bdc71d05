package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.serving.OnlineStore

/** Structured-Streaming ingestion — the stream half of the reference's
  * decoupled ingest path (README: "ingesting data into the online store is
  * decoupled from reading"; stream DataSource in FeatureTable.java:94-97).
  *
  * Two standard shapes:
  *  - continuous materialization: micro-batch → latest-per-key upsert into an
  *    OnlineStore via foreachBatch (exactly the batch LatestValue operator, so
  *    batch and stream materialization cannot diverge semantically);
  *  - windowed aggregation with watermarked event time (the streaming twin of
  *    Analytics.eventsTumble).
  */
object StreamIngest {

  /** Continuous latest-value materialization into an online store. */
  def latestUpsert(
      stream: DataFrame,
      store: OnlineStore,
      keys: Seq[String],
      orderCols: Seq[String],
      valueCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.upsert(batch, keys, orderCols, valueCols)
      }

  /** Streaming ingestion dedup: drop exact re-deliveries of the same
    * (keys, event-ts) within the watermark horizon — the streaming twin of
    * LatestValue.dedup for at-least-once sources. */
  def dedupStream(stream: DataFrame, tsCol: String, keys: Seq[String],
                  watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedAgg(stream: DataFrame, tsCol: String, windowLen: String,
                  watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Convenience: run a writer until all currently-available data is
    * processed (test/demo helper; production would use its own trigger). */
  def runOnce(w: DataStreamWriter[Row], checkpoint: String): StreamingQuery =
    w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
