package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode/feature-extract kernels are STUBS — the container has no
  * image/audio libraries — implemented as deterministic hash-based fakes so
  * the Spark-side contract (schema, batch shape, partitioning, null handling)
  * is real and tested. Swapping in a real decoder only replaces the body of
  * `stubDecode` / `stubFeatures`.
  *
  * Scale design: `mapPartitions` keeps the decode batched per partition
  * (mirroring `mapInPandas` batch processing), preserves partitioning (no
  * shuffle), and streams rows — a 100 TB binary corpus decodes as a pure map.
  */
object Multimodal {

  /** media payload schema: opaque bytes + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Wrap a text table into fake media rows (payload = UTF-8 bytes). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"),
      (length(col(textCol)) % 640 + 16).cast("int").as("width"),
      (length(col(textCol)) % 480 + 16).cast("int").as("height"))

  /** STUB decode kernel: a real implementation would JPEG-decode `payload`;
    * this derives a deterministic content digest standing in for pixel data.
    * MD5 (lowercase hex) so an external SQL engine can recompute it:
    * DuckDB's `md5(text)` over the same UTF-8 bytes yields the same hex. */
  private def stubDecode(payload: Array[Byte]): String = md5Hex(payload)

  /** DuckDB's `md5_number_lower(s)` via the ONE shared packing in
    * [[graft.functions.HashSketch.md5NumberLower]] — the cross-engine
    * convention must not be re-rolled per file. */
  private def md5NumberLower(s: String): Long =
    graft.functions.HashSketch.md5NumberLower(s.getBytes("UTF-8"))

  /** STUB feature kernel: 8 floats derived from the decoded digest — stands
    * in for an embedding model over decoded pixels. Feature i is
    * `(md5_number_lower(digest || '_' || i) & 65535) / 65536.0` — exactly
    * representable in float32 (k·2⁻¹⁶, k < 2¹⁶), so the values survive a
    * float→double round trip bit-identically and the whole pipeline is
    * reproducible in DuckDB SQL. */
  private def stubFeatures(decoded: String): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      out(i) = (md5NumberLower(decoded + "_" + i) & 0xffffL).toFloat / 65536.0f
      i += 1
    }
    out
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Batched decode + feature extraction over media rows. Null payloads pass
    * through with null features (corrupt-file tolerance at scale). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "width", "height").rdd
      .mapPartitions { it =>
        // per-partition batch: a real kernel would init the decoder once here
        it.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val features =
            if (payload == null) null
            else stubFeatures(stubDecode(payload))
          Row(id, if (r.isNullAt(2)) null else r.getInt(2),
            if (r.isNullAt(3)) null else r.getInt(3),
            if (features == null) null else features.toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val dig = graft.functions.HashSketch.md5Digest().digest(bytes)
    val sb = new StringBuilder(32)
    var i = 0
    while (i < dig.length) { sb.append(f"${dig(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("out_w", IntegerType, nullable = true),
    StructField("out_h", IntegerType, nullable = true),
    StructField("resized_sig", StringType, nullable = true)))

  /** Batched resize: aspect-fit every image into a `targetW × targetH` box
    * — the thumbnail/model-input normalization pass. Output dims are EXACT
    * integer arithmetic (`w·tH ≤ tW·h` picks the binding axis; the scaled
    * dim is an integer floor-division), so an external SQL engine computes
    * the same boxes. The pixel kernel is a STUB like [[extractFeatures]]'s:
    * the "resized payload" is stood in for by `md5(md5(payload) || '_' ||
    * out_w || 'x' || out_h)` — swapping in a real scaler replaces only the
    * signature line. Same `mapPartitions` batch shape: decoder/scaler init
    * once per partition, rows stream, no shuffle, null payloads and null
    * dims pass through as null output (corrupt-file tolerance). */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"target box must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "width", "height").rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          if (r.isNullAt(1) || r.isNullAt(2) || r.isNullAt(3))
            Row(id, null, null, null)
          else {
            val w = r.getInt(2); val h = r.getInt(3)
            val (outW, outH) =
              if (w.toLong * targetH <= targetW.toLong * h)
                (math.max(1, (w.toLong * targetH / h).toInt), targetH)
              else (targetW, math.max(1, (h.toLong * targetW / w).toInt))
            val sig = md5Hex(
              (stubDecode(r.getAs[Array[Byte]](1)) + "_" + outW + "x" + outH)
                .getBytes("UTF-8"))
            Row(id, outW, outH, sig)
          }
        }
      }
    spark.createDataFrame(rdd, resizedSchema)
  }

  /** Voice-activity segmentation over opaque audio payloads — the pass
    * that cuts raw audio into speech segments before transcription (the
    * standard audio-corpus curation front door). The payload is windowed
    * into fixed `window`-byte frames (the 10 ms-hop stand-in); each
    * frame's ENERGY is a STUB like [[stubDecode]] — `md5_number_lower`
    * of the frame bytes masked to 10 bits, a deterministic fake both
    * engines recompute exactly; a real implementation would swap in the
    * RMS of decoded PCM samples — and frames at or above `threshold`
    * are voiced. Adjacent voiced frames merge into segments (the same
    * island pattern as the dedup span merge, partitioned by media id).
    *
    * Output: `(media_id, seg_start, seg_end, n_frames, start_ms)` — one
    * row per voiced segment, frame indices 0-based, 10 ms/frame.
    *
    * Scale shape: the frame explode is a pure map (no shuffle); the only
    * exchange is the per-media island window, keyed by `media_id`, so
    * per-task state is bounded by one recording's frame count — a 100 TB
    * audio corpus segments as one map + one media-keyed window. */
  def audioSegments(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 32, threshold: Int = 512): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val framed = docs
      .select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .filter(length(col("__t")) >= 1)
      .withColumn("n_win",
        ((length(col("__t")) + (window - 1)) / window).cast("int"))
      .withColumn("win_idx", explode(sequence(lit(0), col("n_win") - 1)))
      .withColumn("frame",
        expr(s"substring(__t, win_idx * $window + 1, $window)"))
      .withColumn("energy",
        graft.functions.HashExprs.md5NumberLower(col("frame"))
          .bitwiseAND(lit(1023L)))
    val voiced = framed.filter(col("energy") >= threshold)
      .select(col("media_id"), col("win_idx").cast("long").as("pos"))
    Dedup.mergeIslands(voiced, "media_id", width = 1)
      .select(col("media_id"),
        col("island_start").as("seg_start"), col("island_end").as("seg_end"),
        (col("island_end") - col("island_start") + 1L).as("n_frames"),
        (col("island_start") * 10L).as("start_ms"))
  }

  /** Frame sampling stub: every `stride`-th chunk of the payload as a
    * "frame" — the row-explosion shape of video frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int = 64): DataFrame =
    media
      .filter(col("payload").isNotNull)
      // one frame per full stride of payload bytes, minimum one — integer
      // floor division (Column./ is double division; the cast truncates,
      // which equals floor for the non-negative length)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((length(col("payload")) / stride).cast("int") - 1, lit(0)))))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        substring(base64(col("payload")), 1, 16).as("frame_sig"))
}
