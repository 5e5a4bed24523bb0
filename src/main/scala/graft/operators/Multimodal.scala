package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media lives as opaque `binary` columns beside a typed metadata
  * struct; decode/feature steps run per-partition so a real codec
  * (JNI/FFI) would amortize init per partition, not per row. The codecs
  * themselves are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic stub — the Spark-side contract (schema,
  * batching, partitioning) is real and tested, and swapping the stub for
  * libjpeg/ffmpeg is a one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Attach a media binary + metadata struct derived from a source
    * column (here: utf-8 bytes of text — the container has no real
    * media; the column TYPES are what the pipeline contracts on). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "utf-8").as("media"),
      struct(
        lit(format).as("format"),
        octet_length(encode(col(payloadCol), "utf-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** STUB decode kernel: a real implementation calls the codec here
    * (per partition, reusing the handle). The stub derives deterministic
    * pseudo-dimensions from the byte length + first bytes so tests and
    * oracles can pin the plumbing. */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    // ??? <- real codec goes here (libjpeg / ffmpeg via JNI)
    val n = bytes.length
    val w = 64 + (n % 64)
    val h = 64 + ((n / 64) % 64)
    val channels = 3
    (w, h, channels)
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Batch decode: mapPartitions over the binary column. Output schema
    * is fixed (decodedSchema); rows with null media are dropped like a
    * failed decode would be. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      // per-partition: a real codec initializes once here
      it.flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, c) = stubDecode(bytes)
          Iterator(Row(id, w, h, c, bytes.length.toLong))
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame sampling for sequential media: every `stride`-th block of
    * `blockSize` bytes becomes one "frame" row. Pure built-ins
    * (sequence + transform + explode) — fully codegen'd, no UDF. */
  def sampleFrames(media: DataFrame, blockSize: Int, stride: Int): DataFrame = {
    // block offsets measured in BYTES (octet_length/substring on binary);
    // zero-length media produces zero frames, not one empty frame
    val nBlocks = floor((octet_length(col("media")) + blockSize - 1) / blockSize)
    val offsets = when(nBlocks > 0,
      sequence(lit(0), nBlocks - 1, lit(stride)))
      .otherwise(array().cast("array<bigint>"))
    media.select(
      col("media_id"),
      posexplode(transform(offsets,
        b => substring(col("media"), (b * blockSize + 1).cast("int"), lit(blockSize))))
        .as(Seq("frame_idx", "frame")))
      .select(
        col("media_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_hash"))
  }

  /** Byte-level feature extraction with built-ins only: length, an
    * md5 content id, and a coarse 4-bin histogram of the first 256
    * bytes — the kind of cheap signal a curation pipeline pre-computes
    * before expensive decode. */
  def byteFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("media")).as("content_hash"))
}
