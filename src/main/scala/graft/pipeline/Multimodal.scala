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
    * this derives a deterministic content hash standing in for pixel data. */
  private def stubDecode(payload: Array[Byte]): Long = {
    // FNV-1a over the payload — cheap, deterministic, no deps
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** STUB feature kernel: 8 floats derived from the decoded hash — stands in
    * for an embedding model over decoded pixels. */
  private def stubFeatures(decoded: Long): Array[Float] = {
    val out = new Array[Float](8)
    var h = decoded
    var i = 0
    while (i < 8) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt & 0xffff) / 65536.0f
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

  /** Frame sampling stub: every `stride`-th chunk of the payload as a
    * "frame" — the row-explosion shape of video frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int = 64): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(length(col("payload")) / stride - 1, lit(0)))))
      .select(col("media_id"), col("frame_idx"),
        substring(base64(col("payload")), 1, 16).as("frame_sig"))
}
