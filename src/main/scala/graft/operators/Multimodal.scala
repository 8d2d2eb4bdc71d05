package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One media blob with typed metadata (the multimodal column pattern:
  * opaque `binary` payload + structured metadata columns). */
final case class BlobRow(
    doc_id: Long, media_type: String, width: Int, height: Int, blob: Array[Byte])

/** Decoded/extracted features for one blob. */
final case class MediaFeature(
    doc_id: Long, media_type: String, n_bytes: Long, width: Int, height: Int,
    feat_dim: Int, checksum: Long)

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-local batches.
  *
  * The container has no codec libraries, so the DECODE STEP IS A STUB —
  * `decodeStub` below stands in for "JPEG → pixels → feature vector" with a
  * deterministic fake (byte histogram). Everything around it is the real
  * Spark plumbing: schema, binary column, scan-partition-local processing
  * (no shuffle of blob bytes), batched per-partition decode (batch shape =
  * 64 blobs, the same shape a vectorized/Arrow-batched decoder would use),
  * typed Dataset output.
  */
object Multimodal {

  /** Deterministic fake media table derived from documents: utf-8 bytes play
    * the role of encoded frames; metadata derived from doc fields. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[BlobRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        (pmod(col("doc_id") * 7, lit(192)) + 64).cast("int").as("width"),
        (pmod(col("doc_id") * 13, lit(128)) + 64).cast("int").as("height"),
        encode(col("text"), "utf-8").as("blob"))
      .as[BlobRow]
  }

  /** STUB: stands in for a real decoder (image decode / audio resample /
    * video frame-sample). Deterministic: 16-bin byte histogram as "features"
    * + additive checksum. A real deployment swaps only this function. */
  private def decodeStub(blob: Array[Byte]): (Array[Float], Long) = {
    val hist = new Array[Float](16)
    var sum = 0L
    var i = 0
    while (i < blob.length) {
      hist((blob(i) & 0xff) >> 4) += 1f
      sum += (blob(i) & 0xff)
      i += 1
    }
    (hist, sum)
  }

  /** Batched feature extraction over the blob column. */
  def extractFeatures(blobs: Dataset[BlobRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    import blobs.sparkSession.implicits._
    // NO repartition here: blobs are the heaviest bytes in the system and the
    // scan's partitioning already distributes them — a shuffle before the
    // decode step would move every blob over the network for zero benefit.
    blobs
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // decoder-friendly batch shape
          batch.map { b =>
            val (feats, checksum) = decodeStub(b.blob)
            MediaFeature(b.doc_id, b.media_type, b.blob.length.toLong,
              b.width, b.height, feats.length, checksum)
          }
        }
      }
  }

  /** Gate query (rows-only): metadata + stub-extracted features per blob. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF().orderBy(col("doc_id"))

  /** Decoded metadata row of the DuckDB-provable twin. */
  final case class MediaMetaOracle(
      doc_id: Long, media_type: String, width: Int, height: Int,
      n_bytes: Long, checksum_cp: Long)

  /** DuckDB-provable twin of the multimodal pipeline: the SAME binary
    * column + typed metadata + batched mapPartitions plumbing, but the
    * decode step computes engine-neutral values — byte count of the blob
    * and the sum of its UTF-8-decoded code points — which DuckDB recomputes
    * from the text (strlen = bytes, ascii() = code point). The byte-sum
    * checksum of the rows-only gate can't be expressed in DuckDB (no
    * blob→byte-list), so this is the strongest provable surface: it
    * hash-gates everything in the pipeline except the stub decoder body. */
  def multimodalMetaOracle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.map { b =>
            val text = new String(b.blob, java.nio.charset.StandardCharsets.UTF_8)
            val cpSum = text.codePoints().asLongStream().sum()
            MediaMetaOracle(b.doc_id, b.media_type, b.width, b.height,
              b.blob.length.toLong, cpSum)
          }
        }
      }
      .toDF().orderBy(col("doc_id"))
  }

  val multimodalMetaOracleSql: String =
    """SELECT doc_id,
      |  ['image/png','audio/wav','video/mp4'][(doc_id % 3 + 1)::INT] AS media_type,
      |  (doc_id * 7 % 192 + 64)::INT AS width,
      |  (doc_id * 13 % 128 + 64)::INT AS height,
      |  strlen(text)::BIGINT AS n_bytes,
      |  coalesce(list_sum(list_transform(string_split_regex(text, ''),
      |    c -> ascii(c)::BIGINT)), 0)::BIGINT AS checksum_cp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** One sampled frame of a blob. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_start: Long,
                               frame_len: Long, checksum_cp: Long)

  /** Frame sampling: K=4 deterministic windows per blob, evenly spread from
    * the start to the end of the payload — the video/audio "sample N frames
    * per clip" access pattern. The REAL part is the plumbing: windows are
    * cut partition-locally from the binary column (blob bytes never
    * shuffle; the per-frame rows that leave the node are tiny), in the same
    * 64-blob batches a vectorized decoder would take; a real deployment
    * replaces only the per-window byte→feature body. The emitted checksum
    * is the engine-neutral code-point sum so the whole window arithmetic
    * (lengths, offsets, slicing) is DuckDB-hash-gated like
    * multimodalMetaOracle (ASCII corpus ⇒ byte slices = char slices,
    * same documented assumption). */
  /** The frame substrate of [[multimodalFrames]] (and the signature source
    * of [[multimodalNearDup]]): K deterministic windows per blob, cut
    * partition-locally in decoder-shaped batches. */
  def frameSamples(spark: SparkSession, dir: String): Dataset[FrameSample] = {
    import spark.implicits._
    val K = 4
    mediaTable(spark, dir)
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.flatMap { b =>
            val n = b.blob.length.toLong
            val flen = math.max(1L, n / 8L)
            val span = math.max(0L, n - flen)
            (0 until K).map { i =>
              val start = i.toLong * span / (K - 1).toLong
              val bytes = b.blob.slice(start.toInt, (start + flen).toInt)
              val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              FrameSample(b.doc_id, i, start, flen,
                text.codePoints().asLongStream().sum())
            }
          }
        }
      }
  }

  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameSamples(spark, dir).toDF().orderBy(col("doc_id"), col("frame_idx"))

  val multimodalFramesSql: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    greatest(1, strlen(text)::BIGINT // 8) AS flen,
      |    greatest(0, strlen(text)::BIGINT - greatest(1, strlen(text)::BIGINT // 8)) AS span
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, i::INT AS frame_idx,
      |    (i * span) // 3 AS frame_start, flen AS frame_len, text
      |  FROM f CROSS JOIN unnest([0, 1, 2, 3]) AS t(i)
      |)
      |SELECT doc_id, frame_idx,
      |  CAST(frame_start AS BIGINT) AS frame_start,
      |  CAST(frame_len AS BIGINT) AS frame_len,
      |  coalesce(list_sum(list_transform(
      |    string_split_regex(substring(text, (frame_start + 1)::INT, frame_len::INT), ''),
      |    c -> ascii(c)::BIGINT)), 0)::BIGINT AS checksum_cp
      |FROM fr ORDER BY 1, 2""".stripMargin

  /** Exact dedup over the BINARY column: group blobs by md5 digest, keep
    * the lowest doc_id per group — "same encoded file stored twice" is the
    * single highest-yield dedup in any crawled media corpus and must run
    * BEFORE any decode step (a 16-byte digest comparison vs a full
    * decode). Scale shape: the digest is computed partition-locally at the
    * scan, so only (digest, doc_id, n_bytes) triples shuffle — blob bytes
    * never leave their partition (same invariant as the rest of this
    * file). The DuckDB gate recomputes md5 over the text the blob was
    * encoded from (UTF-8 bytes identical by construction), so grouping,
    * keep rule, and byte accounting are all hash-proven. */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame =
    multimodalDedupOf(mediaTable(spark, dir).toDF())

  def multimodalDedupOf(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"), md5(col("blob")).as("blob_md5"),
        length(col("blob")).cast("long").as("n_bytes"))
      .groupBy(col("blob_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"),
        max(col("n_bytes")).as("n_bytes"))
      .orderBy(col("blob_md5"))

  val multimodalDedupSql: String =
    """SELECT md5(text) AS blob_md5, count(*) AS n_copies,
      | min(doc_id) AS keep_doc_id, CAST(max(strlen(text)) AS BIGINT) AS n_bytes
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Near-duplicate blobs via frame-signature banding — the perceptual-
    * dedup access pattern (pHash-style) over the [[frameSamples]]
    * substrate: two blobs are near-dup candidates when they agree on a
    * whole frame window (same index, length, checksum), and a pair is
    * reported when ≥ 2 of the 4 frames agree — catching re-encoded /
    * padded / prefix-trimmed copies whose md5 differs so
    * [[multimodalDedup]] misses them, without ever decoding twice or
    * comparing all pairs.
    *
    * Scale shape is dedup_ngram's: candidates ride an inverted-index
    * equi-join on the (frame_idx, frame_len, checksum) band — only blobs
    * sharing a band ever pair — and the hot-band cap is a window over the
    * SAME keys the self-join shuffles on, so the filtered subtree is
    * identical on both sides and the exchange is reused (one frame
    * derivation, one shuffle). Bands larger than `maxBucket` are dropped:
    * a band that hot is an exact-dup farm, which is [[multimodalDedup]]'s
    * 16-byte-digest job, not a frame join's. The checksum is the
    * engine-neutral codepoint sum, so the full pipeline is
    * DuckDB-hash-gated. */
  def multimodalNearDup(spark: SparkSession, dir: String): DataFrame =
    multimodalNearDupOf(frameSamples(spark, dir).toDF())

  def multimodalNearDupOf(frames: DataFrame, maxBucket: Long = 1000L): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_idx"), col("frame_len"), col("checksum_cp"))
    val fr = frames
      .select(col("doc_id"), col("frame_idx"), col("frame_len"), col("checksum_cp"))
      .withColumn("n_bkt", count(lit(1)).over(wB))
      .filter(col("n_bkt") <= maxBucket)
      .drop("n_bkt")
    fr.as("a").join(fr.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.frame_len") === col("b.frame_len") &&
          col("a.checksum_cp") === col("b.checksum_cp") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_match")) // one row per doc per frame_idx ⇒ = #agreeing frames
      .filter(col("n_match") >= 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The near-dup pair derivation as a reusable CTE body (shared with the
    * [[multimodalClusters]] recursive-closure oracle). */
  private val nearDupPairsSqlCte: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    greatest(1, strlen(text)::BIGINT // 8) AS flen,
      |    greatest(0, strlen(text)::BIGINT - greatest(1, strlen(text)::BIGINT // 8)) AS span
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, i::INT AS frame_idx,
      |    (i * span) // 3 AS frame_start, flen AS frame_len, text
      |  FROM f CROSS JOIN unnest([0, 1, 2, 3]) AS t(i)
      |), fx AS (
      |  SELECT doc_id, frame_idx, CAST(frame_len AS BIGINT) AS frame_len,
      |    coalesce(list_sum(list_transform(
      |      string_split_regex(substring(text, (frame_start + 1)::INT, frame_len::INT), ''),
      |      c -> ascii(c)::BIGINT)), 0)::BIGINT AS checksum_cp
      |  FROM fr
      |), capped AS (
      |  SELECT * FROM (
      |    SELECT fx.*, count(*) OVER
      |      (PARTITION BY frame_idx, frame_len, checksum_cp) AS n_bkt
      |    FROM fx)
      |  WHERE n_bkt <= 1000
      |), npairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(count(*) AS BIGINT) AS n_match
      |  FROM capped a JOIN capped b
      |    ON a.frame_idx = b.frame_idx AND a.frame_len = b.frame_len
      |   AND a.checksum_cp = b.checksum_cp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |)""".stripMargin

  val multimodalNearDupSql: String =
    nearDupPairsSqlCte +
    """
      |SELECT id_a, id_b, n_match FROM npairs ORDER BY 1, 2""".stripMargin

  /** Duplicate-group resolution for the media corpus: connected components
    * over (exact blob-digest) ∪ (frame-signature near-dup) edges, keep =
    * component min — the same pairs-alone-don't-resolve-chains step
    * `dedup_clusters` runs for text (a re-encoded copy A≈B and B's exact
    * clone C are ONE group even though A and C share no band). Edges are
    * (doc_id, doc_id) pairs only — blob bytes never enter the fixpoint —
    * and the shared [[Components]] hybrid loop bounds rounds at
    * budget + O(log n). The oracle recomputes the closure recursively over
    * the same two edge families. */
  def multimodalClusters(spark: SparkSession, dir: String): DataFrame = {
    val blobs = mediaTable(spark, dir).toDF()
    val withHash = blobs.select(col("doc_id"), md5(col("blob")).as("h"))
    val roots = withHash.groupBy(col("h")).agg(min(col("doc_id")).as("root"))
    val exactEdges = withHash.join(roots, "h")
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("a"), col("root").as("b"))
    val nearEdges = multimodalNearDup(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val labels = Components.minLabel(exactEdges.unionByName(nearEdges))
    val clustered = labels.select(col("doc_id"), col("lbl").as("cluster_id"),
      (col("doc_id") === col("lbl")).as("keep"))
    val singletons = blobs.select(col("doc_id"))
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), lit(true).as("keep"))
    clustered.unionByName(singletons).orderBy(col("doc_id"))
  }

  val multimodalClustersSql: String =
    nearDupPairsSqlCte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
    """, eh AS (
      |  SELECT doc_id, md5(text) AS h FROM documents
      |), eroots AS (
      |  SELECT h, min(doc_id) AS root FROM eh GROUP BY 1
      |), eedges AS (
      |  SELECT eh.doc_id AS a, er.root AS b FROM eh JOIN eroots er USING (h)
      |  WHERE eh.doc_id <> er.root
      |), edges AS (
      |  SELECT a, b FROM eedges UNION SELECT b, a FROM eedges
      |  UNION SELECT id_a, id_b FROM npairs UNION SELECT id_b, id_a FROM npairs
      |), reach(doc_id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.b
      |)
      |SELECT doc_id, min(lbl) AS cluster_id, doc_id = min(lbl) AS keep
      |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta"        -> (multimodalMeta _),
    "multimodal_meta_oracle" -> (multimodalMetaOracle _),
    "multimodal_frames"      -> (multimodalFrames _),
    "multimodal_dedup"       -> (multimodalDedup _),
    "multimodal_near_dup"    -> (multimodalNearDup _),
    "multimodal_clusters"    -> (multimodalClusters _))

  val oracle: Map[String, String] = Map(
    "multimodal_meta_oracle" -> multimodalMetaOracleSql,
    "multimodal_frames"      -> multimodalFramesSql,
    "multimodal_dedup"       -> multimodalDedupSql,
    "multimodal_near_dup"    -> multimodalNearDupSql,
    "multimodal_clusters"    -> multimodalClustersSql)
}
