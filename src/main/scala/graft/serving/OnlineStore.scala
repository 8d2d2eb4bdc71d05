package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.LatestValue

/** Online-store abstraction (reference: storage/api OnlineRetrieverV2 + the
  * redis/cassandra/bigtable connectors). The reference stores exactly one
  * latest feature row per entity key; connectors are I/O adapters, not
  * compute. Here the interface is kept, with a parquet-backed reference
  * implementation so materialization → serving round-trips are testable
  * without an external KV service.
  */
trait OnlineStore {
  /** Merge a batch of feature rows: latest per key wins across the existing
    * store contents and the new batch. */
  def upsert(rows: DataFrame, keys: Seq[String], orderCols: Seq[String],
             valueCols: Seq[String]): Unit

  /** Current store contents (one row per key). */
  def snapshot(spark: SparkSession): DataFrame
}

object OnlineStore {
  /** Construct an executable store from its registry StoreSpec — the wiring
    * the reference does in core/model/Store.java:30-70 (StoreType →
    * connector config class) and serving's ServingServiceConfigV2 (active
    * store config → retriever): a store DECLARED in the registry becomes a
    * USABLE handle without the caller knowing connector classes.
    *
    * Types: "parquet" → [[ParquetOnlineStore]] at `config("path")`;
    * "memory" → [[MemoryOnlineStore]] (per-name singleton, so every handle
    * to the same declared store shares state the way two clients of one
    * Redis do). Unknown types fail fast, mirroring Store.fromProto's
    * "Unsupported store type" error. */
  def fromSpec(spec: graft.model.StoreSpec): OnlineStore =
    spec.storeType.toLowerCase match {
      case "parquet" =>
        val path = spec.config.getOrElse("path", throw new IllegalArgumentException(
          s"store ${spec.name}: parquet store requires config key 'path'"))
        new ParquetOnlineStore(path)
      case "memory" =>
        memoryStores.getOrElseUpdate(spec.name, new MemoryOnlineStore)
      case other =>
        throw new IllegalArgumentException(s"Unsupported store type: $other")
    }

  private val memoryStores =
    scala.collection.concurrent.TrieMap.empty[String, MemoryOnlineStore]
}

/** Hadoop-FileSystem path helpers: store/log paths must resolve through the
  * path's OWN filesystem (HDFS/S3/local) — a `java.io.File` probe is always
  * false off the local disk, which at cluster scale silently turns
  * incremental work into full restarts. */
private[graft] object StorePaths {
  def fs(spark: SparkSession, path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path); f.exists(p)
  }

  /** True iff the path holds a COMPLETED write — the Hadoop committer's
    * `_SUCCESS` marker, not mere directory existence: a partially-written
    * artifact dir left by a crashed writer must not satisfy a probe (it
    * would be read as a truncated artifact forever). */
  def existsComplete(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
  }

  /** Write a parquet artifact atomically: write to a sibling temp dir,
    * then rename onto the final path — readers either see the previous
    * complete artifact or the new complete one, never a partial dir.
    * `partitionCols` lays the artifact out hive-style (one directory per
    * value) so probes filtering on those columns read ONLY matching
    * partitions — the inverted-index layout a 100 TB ANN/band store
    * needs (the committer still writes the root `_SUCCESS`, so the
    * completeness probe is unchanged). */
  def writeParquetAtomic(df: org.apache.spark.sql.DataFrame, path: String,
                         partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val (f, p) = fs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, p.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (f.exists(p)) f.delete(p, true)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"atomic artifact rename failed: $tmp -> $p")
  }

  /** THE fingerprinted-artifact discipline, factored once (trade edges,
    * dedup cluster labels, knn graph, co-activity components, and the
    * exact-truth recall baselines all ride this): resolve
    * `<base>/<prefix><fingerprint>` under the `baseConfKey` spark conf
    * (default `java.io.tmpdir/<defaultSub>`), serve it when a COMPLETE
    * write exists ([[existsComplete]]'s `_SUCCESS` probe), otherwise run
    * `derive`, write atomically, and GC superseded same-prefix
    * fingerprints of the SAME key. One implementation so a fix to the
    * completeness probe, the atomic write, or the GC filter can never
    * apply to only one copy.
    *
    * `prefix` must be collision-proof per corpus and end with the
    * key↔fingerprint delimiter — build it from [[corpusKey]], whose
    * sanitizer bans '-' so one corpus's artifact name can never be a
    * prefix of a sibling's (the GC would delete live artifacts). */
  def cachedArtifact(spark: SparkSession, baseConfKey: String, defaultSub: String,
                     prefix: String, fingerprint: String,
                     partitionCols: Seq[String] = Nil)(
                     derive: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = spark.conf.getOption(baseConfKey)
      .getOrElse(sys.props("java.io.tmpdir") + "/" + defaultSub)
    val path = base + "/" + prefix + fingerprint
    if (!existsComplete(spark, path)) {
      writeParquetAtomic(derive, path, partitionCols)
      val cur = new org.apache.hadoop.fs.Path(path)
      val f = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(cur.getParent)) {
        // compare by NAME: listStatus returns fully-qualified paths while
        // `cur` may be scheme-less, so Path equality would match nothing
        // and the freshly-written artifact itself would be deleted.
        // '.tmp-' names are a CONCURRENT writer's in-flight staging dirs
        // (writeParquetAtomic names them '<artifact>.tmp-<uuid>', which
        // startsWith(prefix) too) — deleting one mid-write fails the other
        // process's rename, so GC only touches completed artifacts
        f.listStatus(cur.getParent)
          .filter(st => st.getPath.getName.startsWith(prefix) &&
            st.getPath.getName != cur.getName &&
            !st.getPath.getName.contains(".tmp-"))
          .foreach(st => f.delete(st.getPath, true))
      }
    }
    spark.read.parquet(path)
  }

  /** Collision-proof corpus component of an artifact name: the sanitized
    * dir is readable but LOSSY (`/a/b` vs `/a_b` collide, and colliding
    * corpora GC each other's artifacts into perpetual re-derivation), so a
    * short hash of the RAW dir disambiguates. '-' is banned through the
    * sanitizer — it is the key↔fingerprint delimiter (see
    * [[cachedArtifact]]); the "g" prefix keeps an absolute path's
    * sanitized "_" head from reading as Hadoop-hidden. */
  def corpusKey(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)
    "g" + dir.replaceAll("[^A-Za-z0-9._]", "_") + "." + h
  }

  /** Content fingerprint of the named tables under `dir`: parquet part
    * names/sizes/mtimes — one FS metadata listing per table, no data scan.
    * 128-bit digest: a fingerprint exists to rule out silent staleness, so
    * a 32-bit hash's collision budget would defeat its own purpose. */
  def tableFingerprint(spark: SparkSession, dir: String, tables: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sig = tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val f = p.getFileSystem(conf)
      try f.listStatus(p).sortBy(_.getPath.getName)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .mkString("|")
      catch { case _: java.io.FileNotFoundException => s"$t:absent" }
    }.mkString("||")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }
}

/** Materialization bookkeeping (reference: core's JobService tracks
  * ingestion jobs per table/source/store — here a tiny append-only parquet
  * log of completed windows). Enables incremental materialization: the
  * next run starts where the last finished instead of rescanning history —
  * at 100 TB the difference between a daily delta and a full re-read. */
final class MaterializationLog(path: String) {

  def record(spark: SparkSession, project: String, table: String, storeName: String,
             startInclusive: String, endExclusive: String, rows: Long): Unit = {
    import spark.implicits._
    Seq((project, table, storeName, startInclusive, endExclusive, rows,
        java.time.Instant.now().toString))
      .toDF("project", "table_name", "store_name", "start_ts", "end_ts",
        "n_rows", "recorded_at")
      .write.mode("append").parquet(path)
  }

  /** Exclusive end of the latest completed window for (project, table,
    * store), i.e. the next run's inclusive start. */
  def lastEndExclusive(spark: SparkSession, project: String, table: String,
                       storeName: String): Option[String] = {
    if (!StorePaths.exists(spark, path)) return None
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .filter(col("project") === project && col("table_name") === table &&
        col("store_name") === storeName)
      .agg(max(col("end_ts")))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
  }

  def entries(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.read.parquet(path)
}

/** Parquet-directory store: durable, idempotent upserts via read-merge-write.
  * At cluster scale this would be a KV connector (the merge itself is the
  * same single-pass LatestValue aggregation). */
final class ParquetOnlineStore(path: String) extends OnlineStore {

  override def upsert(rows: DataFrame, keys: Seq[String], orderCols: Seq[String],
                      valueCols: Seq[String]): Unit =
    stageThenSwap(merge(rows, keys, orderCols, valueCols))

  /** Upsert with the TTL cutoff fused into the merge's single read: rows
    * (existing or incoming) whose event time already lapsed are dropped in
    * the same stage-then-swap write the merge pays anyway. A separate
    * [[compact]] pass re-scans the whole store AFTER upsert just read it —
    * at store scale the scans ARE the cost of maintenance, so the steady
    * state (periodic materialize + TTL hygiene) should pay one read, not
    * two. Serving semantics for lapsed keys change only from
    * OUTSIDE_MAX_AGE to NOT_FOUND (both serve no value), exactly like
    * [[compact]] and the reference's per-key KV expiry. */
  def upsertCompacting(rows: DataFrame, keys: Seq[String], orderCols: Seq[String],
                       valueCols: Seq[String], eventTsCol: String, maxAgeSec: Long,
                       nowTs: java.sql.Timestamp): Unit = {
    import org.apache.spark.sql.functions._
    val cutoff = unix_micros(lit(nowTs)) - maxAgeSec * 1000000L
    stageThenSwap(merge(rows, keys, orderCols, valueCols)
      .filter(unix_micros(col(eventTsCol)) >= cutoff))
  }

  /** Latest-per-key merge of the incoming batch with the live store (one
    * read of the existing contents; no write). */
  private def merge(rows: DataFrame, keys: Seq[String], orderCols: Seq[String],
                    valueCols: Seq[String]): DataFrame = {
    val spark = rows.sparkSession
    val cols = (keys ++ (orderCols ++ valueCols).distinct).distinct
    val incoming = LatestValue.latest(rows, keys, orderCols, (orderCols ++ valueCols).distinct)
      .selectExpr(cols: _*)
    if (StorePaths.exists(spark, path))
      LatestValue.latest(
        spark.read.parquet(path).selectExpr(cols: _*).unionByName(incoming),
        keys, orderCols, (orderCols ++ valueCols).distinct)
        .selectExpr(cols: _*)
    else incoming
  }

  /** Stage-then-swap write discipline shared by upsert and compact: the
    * computation reads the live path, so materialize fully into a staging
    * dir first, then replace via the path's own FileSystem (works on
    * HDFS/S3A the same as on local disk; no driver collect). */
  private def stageThenSwap(replacement: DataFrame): Unit = {
    val spark = replacement.sparkSession
    val staging = path + "__staging"
    replacement.write.mode("overwrite").parquet(staging)
    val (fsys, target) = StorePaths.fs(spark, path)
    if (fsys.exists(target)) fsys.delete(target, true)
    require(fsys.rename(new org.apache.hadoop.fs.Path(staging), target),
      s"swap failed: $path")
  }

  override def snapshot(spark: SparkSession): DataFrame =
    spark.read.parquet(path)

  /** TTL compaction: drop keys whose latest row is already older than
    * `maxAgeSec` at `nowTs` — those rows can only ever serve
    * OUTSIDE_MAX_AGE (value NULL), so at scale they are dead weight the
    * store pays for on every merge and snapshot scan. Serving semantics
    * change only from OUTSIDE_MAX_AGE to NOT_FOUND (both serve no value);
    * the reference's TTL stores (e.g. per-key Redis expiry) make the same
    * transition when a key lapses. Same stage-then-swap write discipline
    * as upsert. This standalone pass exists for TTL hygiene BETWEEN
    * ingestion runs; the steady-state materialize loop should use
    * [[upsertCompacting]], which fuses the same cutoff into the merge's
    * single read instead of paying a second full store scan. */
  def compact(spark: SparkSession, eventTsCol: String, maxAgeSec: Long,
              nowTs: java.sql.Timestamp): Long = {
    import org.apache.spark.sql.functions._
    if (!StorePaths.exists(spark, path)) return 0L
    val cutoff = unix_micros(lit(nowTs)) - maxAgeSec * 1000000L
    // one aggregate pass decides; the rewrite pass only happens when
    // something actually lapsed — at store scale the scans ARE the cost of
    // compaction, so bookkeeping must not add passes of its own
    val lapsed = Option(
      spark.read.parquet(path)
        .agg(sum(when(unix_micros(col(eventTsCol)) < cutoff, 1L).otherwise(0L)))
        .head().getAs[java.lang.Long](0)).map(_.toLong).getOrElse(0L)
    if (lapsed > 0L)
      stageThenSwap(spark.read.parquet(path)
        .filter(unix_micros(col(eventTsCol)) >= cutoff))
    lapsed
  }
}

/** Snapshot-store template behind the "memory" StoreSpec type — the
  * DEFAULT demo store. Earlier builds held collected Rows on the driver
  * (fine for specs, but a wide key space would have made the DRIVER the
  * store); contents now live as a parquet snapshot under a managed
  * scratch path with [[ParquetOnlineStore]]'s distributed latest-merge
  * and stage-then-swap write — NO collect anywhere in the upsert path,
  * so a declared demo store scales exactly like the durable one. The
  * per-name singleton handed out by [[OnlineStore.fromSpec]] keeps the
  * reference semantics (two handles to one declared store share state
  * like two clients of one Redis); a real KV connector swaps the
  * snapshot read/write for client put/get calls, nothing else.
  *
  * Scratch path: the `graft.snapstore.dir` session conf, when set, roots
  * every snapshot store there (each instance under its own random subdir)
  * — on a real cluster point it at SHARED storage, because executors
  * cannot reach a driver-local tmpdir. The default (a driver-local temp
  * directory) is LOCAL-MODE ONLY, which is exactly the demo/spec scope
  * this store exists for. */
final class MemoryOnlineStore extends OnlineStore {
  @volatile private var inner: ParquetOnlineStore = _
  @volatile private var touched = false

  private def innerFor(spark: SparkSession): ParquetOnlineStore = synchronized {
    if (inner == null) {
      val base = spark.conf.getOption("graft.snapstore.dir")
        .getOrElse(java.nio.file.Files.createTempDirectory("graft_snapstore").toString)
      inner = new ParquetOnlineStore(
        base + "/snap_" + java.util.UUID.randomUUID().toString.take(12) + "/store")
    }
    inner
  }

  override def upsert(rows: DataFrame, keys: Seq[String], orderCols: Seq[String],
                      valueCols: Seq[String]): Unit = {
    innerFor(rows.sparkSession).upsert(rows, keys, orderCols, valueCols)
    touched = true
  }

  override def snapshot(spark: SparkSession): DataFrame =
    if (touched) innerFor(spark).snapshot(spark)
    else throw new IllegalStateException("empty online store")
}
