package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every entity row at `entityTs`, attach
  * the latest feature row with `featureTs <= entityTs`, optionally dropping
  * it when older than a TTL (reference semantics:
  * serving/src/main/java/feast/serving/service/OnlineServingServiceV2.java
  * checkOutsideMaxAge + Feast 0.9 historical retrieval).
  *
  * Scale design: the naive formulation — range-join then
  * `row_number() ... rn = 1` — explodes to |entity| × |matching features|
  * intermediate rows before pruning; at 100 TB with hot keys that is the
  * job-killing shuffle. This implementation uses the union-sort algorithm
  * instead: tag feature and entity rows, union them, and run ONE window pass
  * partitioned by key ordered by time, carrying the last seen feature
  * forward. Cost: a single hash shuffle of |E| + |F| rows and a per-key
  * sort — linear, no explosion, and AQE can split skewed keys because the
  * window frame is running (each split is still correct within its key after
  * AQE skew handling falls back to a single partition per key).
  */
object PointInTimeJoin {

  /** @param entity      entity rows; every column is preserved in the output
    * @param features    feature rows (keys ++ featureTs ++ featureCols)
    * @param keys        join key columns present on both sides
    * @param entityTs    entity event-timestamp column name
    * @param featureTs   feature event-timestamp column name
    * @param featureCols feature value columns to attach
    * @param maxAgeSec   TTL: latest feature older than entityTs − maxAge is
    *                    dropped (attached columns become null)
    * @param outPrefix   attached columns are named s"${outPrefix}$col"; the
    *                    matched feature timestamp is s"${outPrefix}ts"
    */
  def asof(
      entity: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      entityTs: String,
      featureTs: String,
      featureCols: Seq[String],
      maxAgeSec: Option[Long] = None,
      outPrefix: String = "feat_"): DataFrame = {
    val keyCols = keys.map(col)

    val entityOut = entity.columns.toSeq
    val e = entity
      .withColumn("__ts", col(entityTs))
      .withColumn("__is_entity", lit(1))
    val f = features.select(
      keyCols ++ Seq(
        col(featureTs).as("__ts"),
        struct(featureCols.map(col): _*).as("__feat"),
        lit(0).as("__is_entity")): _*)

    // Window order does triple duty, so feature-side ties need NO separate
    // dedup aggregation (saves a whole shuffle+sort of the feature table):
    //  - __ts asc: as-of ordering;
    //  - __is_entity asc: features sort before entities at equal __ts, so an
    //    exact-timestamp feature is visible to the entity row (<= semantics);
    //  - __feat asc: among feature rows at the same (key, ts), last() sees
    //    the greatest feature struct — the deterministic latest-wins rule
    //    (use LatestValue.dedup upstream for explicit created-ts semantics).
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__is_entity").asc, col("__feat").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = e
      .unionByName(f, allowMissingColumns = true)
      .withColumn("__last_ts",
        last(when(col("__is_entity") === 0, col("__ts")), ignoreNulls = true).over(w))
      .withColumn("__last_feat", last(col("__feat"), ignoreNulls = true).over(w))
      .filter(col("__is_entity") === 1)

    val fresh = maxAgeSec match {
      case Some(age) =>
        col("__last_ts").isNotNull &&
          unix_micros(col("__last_ts")) >= unix_micros(col(entityTs)) - age * 1000000L
      case None => col("__last_ts").isNotNull
    }

    val out = attached
      .withColumn(s"${outPrefix}ts", when(fresh, col("__last_ts")))
      .withColumns(featureCols.map(c =>
        s"$outPrefix$c" -> when(fresh, col(s"__last_feat.$c"))).toMap)

    out.select(entityOut.map(col) ++
      (s"${outPrefix}ts" +: featureCols.map(c => s"$outPrefix$c")).map(col): _*)
  }

  /** Skew-proof variant of [[asof]] for pathologically hot keys.
    *
    * A window partitioned by key cannot be salted or AQE-split — every row of
    * a key must land in one partition, so ONE key with billions of rows
    * stalls the stage. This variant shards the timeline instead: partition by
    * (key, time-bucket) and stitch buckets with a carry-in summary:
    *
    *  1. per-(key, bucket) last-feature summary — a partial-aggregatable
    *     `max(struct(ts, feat))` groupBy (map-side combined, tiny output);
    *  2. carry-in per bucket = running max of summaries over PRECEDING
    *     buckets (a window over the per-bucket summary — rows per key =
    *     #buckets, not #events);
    *  3. the [[asof]] union-sort pass, but partitioned by (key, bucket), with
    *     the carry-in as the fallback when a bucket has no earlier feature.
    *
    * Identical results to [[asof]]; `bucketSec` trades shuffle-key fan-out
    * against summary size (e.g. 1 day for multi-year event streams).
    */
  def asofBucketed(
      entity: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      entityTs: String,
      featureTs: String,
      featureCols: Seq[String],
      bucketSec: Long,
      maxAgeSec: Option[Long] = None,
      outPrefix: String = "feat_"): DataFrame = {
    val keyCols = keys.map(col)
    val bucketLenUs = bucketSec * 1000000L
    def bucketOf(ts: String) = floor(unix_micros(col(ts)) / bucketLenUs).cast("long")

    val entityOut = entity.columns.toSeq
    val e = entity
      .withColumn("__ts", col(entityTs))
      .withColumn("__bucket", bucketOf(entityTs))
      .withColumn("__is_entity", lit(1))
    val f = features.select(
      keyCols ++ Seq(
        col(featureTs).as("__ts"),
        struct(featureCols.map(col): _*).as("__feat"),
        lit(0).as("__is_entity")): _*)
      .withColumn("__bucket", bucketOf("__ts"))

    // 1. per-(key, bucket) latest feature (lexicographic max over (ts, feat))
    val summary = f
      .groupBy(keyCols :+ col("__bucket"): _*)
      .agg(max(struct(col("__ts").as("ts"), col("__feat").as("f"))).as("__last"))

    // 2. carry-in per occupied bucket (union of feature- and entity-buckets,
    //    so entity buckets with no in-bucket feature still get a carry)
    val allBuckets = summary.select(keyCols :+ col("__bucket"): _*)
      .unionByName(e.select(keyCols :+ col("__bucket"): _*))
      .distinct()
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets
      .join(summary, keys :+ "__bucket", "left")
      .withColumn("__carry", max(col("__last")).over(wCarry))
      .select(keyCols ++ Seq(col("__bucket"), col("__carry")): _*)

    // 3. in-bucket union-sort pass, partitioned by (key, bucket)
    val w = Window
      .partitionBy(keyCols :+ col("__bucket"): _*)
      .orderBy(col("__ts").asc, col("__is_entity").asc, col("__feat").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = e
      .unionByName(f, allowMissingColumns = true)
      .withColumn("__in_ts",
        last(when(col("__is_entity") === 0, col("__ts")), ignoreNulls = true).over(w))
      .withColumn("__in_feat", last(col("__feat"), ignoreNulls = true).over(w))
      .filter(col("__is_entity") === 1)
      .join(carry, keys :+ "__bucket", "left")
      .withColumn("__last_ts", coalesce(col("__in_ts"), col("__carry.ts")))
      .withColumn("__last_feat", coalesce(col("__in_feat"), col("__carry.f")))

    val fresh = maxAgeSec match {
      case Some(age) =>
        col("__last_ts").isNotNull &&
          unix_micros(col("__last_ts")) >= unix_micros(col(entityTs)) - age * 1000000L
      case None => col("__last_ts").isNotNull
    }

    attached
      .withColumn(s"${outPrefix}ts", when(fresh, col("__last_ts")))
      .withColumns(featureCols.map(c =>
        s"$outPrefix$c" -> when(fresh, col(s"__last_feat.$c"))).toMap)
      .select(entityOut.map(col) ++
        (s"${outPrefix}ts" +: featureCols.map(c => s"$outPrefix$c")).map(col): _*)
  }

  /** Forward as-of join: the EARLIEST feature with `featureTs >= entityTs`
    * (the mirror of [[asof]] — "what happened next", e.g. labeling events
    * with the following outcome). Same union-sort algorithm, one shuffle,
    * no range-join explosion; only the window direction flips (__ts desc,
    * so the running last() carries the closest FUTURE feature). Tie rules
    * match [[asof]]: an exact-timestamp feature is visible (>= includes
    * equality), and among features at one (key, ts) the greatest feature
    * struct wins. `maxAgeSec` bounds how far AHEAD a feature may be. */
  def asofForward(
      entity: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      entityTs: String,
      featureTs: String,
      featureCols: Seq[String],
      maxAgeSec: Option[Long] = None,
      outPrefix: String = "feat_"): DataFrame = {
    val keyCols = keys.map(col)

    val entityOut = entity.columns.toSeq
    val e = entity
      .withColumn("__ts", col(entityTs))
      .withColumn("__is_entity", lit(1))
    val f = features.select(
      keyCols ++ Seq(
        col(featureTs).as("__ts"),
        struct(featureCols.map(col): _*).as("__feat"),
        lit(0).as("__is_entity")): _*)

    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts").desc, col("__is_entity").asc, col("__feat").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = e
      .unionByName(f, allowMissingColumns = true)
      .withColumn("__last_ts",
        last(when(col("__is_entity") === 0, col("__ts")), ignoreNulls = true).over(w))
      .withColumn("__last_feat", last(col("__feat"), ignoreNulls = true).over(w))
      .filter(col("__is_entity") === 1)

    val fresh = maxAgeSec match {
      case Some(age) =>
        col("__last_ts").isNotNull &&
          unix_micros(col("__last_ts")) <= unix_micros(col(entityTs)) + age * 1000000L
      case None => col("__last_ts").isNotNull
    }

    attached
      .withColumn(s"${outPrefix}ts", when(fresh, col("__last_ts")))
      .withColumns(featureCols.map(c =>
        s"$outPrefix$c" -> when(fresh, col(s"__last_feat.$c"))).toMap)
      .select(entityOut.map(col) ++
        (s"${outPrefix}ts" +: featureCols.map(c => s"$outPrefix$c")).map(col): _*)
  }

  /** Nearest as-of join: whichever of the backward/forward matches is
    * closer in time wins; equal distance prefers the backward match (the
    * deterministic choice that degrades to plain [[asof]] when the future
    * is empty). Built by CHAINING the two one-shuffle passes — the
    * backward result's attached columns ride the forward pass as ordinary
    * entity columns — so the cost is two linear window passes, never a
    * |E|×|F| candidate join. `maxAgeSec` bounds the distance on BOTH
    * sides. */
  def asofNearest(
      entity: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      entityTs: String,
      featureTs: String,
      featureCols: Seq[String],
      maxAgeSec: Option[Long] = None,
      outPrefix: String = "feat_"): DataFrame = {
    val entityOut = entity.columns.toSeq
    val back = asof(entity, features, keys, entityTs, featureTs,
      featureCols, maxAgeSec, "__b_")
    val both = asofForward(back, features, keys, entityTs, featureTs,
      featureCols, maxAgeSec, "__f_")
    val db = abs(unix_micros(col("__b_ts")) - unix_micros(col(entityTs)))
    val df = abs(unix_micros(col("__f_ts")) - unix_micros(col(entityTs)))
    val pickBack = col("__b_ts").isNotNull && (col("__f_ts").isNull || db <= df)
    both
      .withColumn(s"${outPrefix}ts",
        when(pickBack, col("__b_ts")).otherwise(col("__f_ts")))
      .withColumns(featureCols.map(c =>
        s"$outPrefix$c" ->
          when(pickBack, col(s"__b_$c")).otherwise(col(s"__f_$c"))).toMap)
      .select(entityOut.map(col) ++
        (s"${outPrefix}ts" +: featureCols.map(c => s"$outPrefix$c")).map(col): _*)
  }
}
