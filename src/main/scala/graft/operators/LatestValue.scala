package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-feature-row-per-entity-key — the materialization primitive behind
  * the reference's online stores (reference: Redis/Cassandra connectors store
  * exactly one latest row per entity key; RedisKeyGenerator.java).
  *
  * Spark-first: a single-pass `max_by(struct(values), struct(order))`
  * aggregation. This is partial-aggregatable, so Spark does map-side combine
  * before the shuffle — at 100 TB that moves one row per key per input
  * partition across the network, where the window+filter formulation
  * (`row_number() ... rn=1`) would shuffle and sort EVERY raw row.
  */
object LatestValue {

  /** @param orderCols  ordering columns, latest = lexicographic max
    *                   (event_ts first, then a created/sequence tiebreak)
    * @param valueCols  columns to carry into the result
    */
  def latest(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
             valueCols: Seq[String]): DataFrame = {
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*),
                  struct(orderCols.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Ingestion dedup: exactly one row per (keys ∪ eventTs); the row with the
    * greatest tiebreak (created timestamp / sequence id) wins — the
    * reference's upsert-on-ingest semantics. */
  def dedup(df: DataFrame, keys: Seq[String], eventTs: String,
            tiebreak: Seq[String], valueCols: Seq[String]): DataFrame =
    latest(df, keys :+ eventTs, tiebreak, valueCols)
}
