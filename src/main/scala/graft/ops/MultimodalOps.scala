package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode / feature-extraction staged behind a
  * per-partition batch boundary.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake — but the Spark-side shape is the
  * real one a production decode would use: a typed Dataset, batch
  * iteration per partition (`mapPartitions`, the JVM analog of
  * arrow-batched decode UDFs), fixed output schema, no driver
  * round-trips. Swapping the fake for a real codec touches only the
  * body of one function.
  *
  * Scale: decode is embarrassingly parallel, one pass, no shuffle; the
  * expensive byte payloads are projected only where needed (binary
  * column pruning), and partition sizing is inherited from the parquet
  * reader (`maxPartitionBytes`), so batches stay memory-bounded.
  */
object MultimodalOps {

  /** Typed metadata row for a decoded media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int, format: String)

  /** STUB — stands in for a real image decode (e.g. libjpeg via JNI or
    * an arrow-batched codec). Deterministic fake derived from payload
    * bytes so tests are stable. A real implementation replaces only
    * this body. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    MediaMeta(id, n, (n % 317) + 1, (first * 7 % 97) + 1, 3, "fake/rgb8")
  }

  /** Documents' text bytes treated as opaque binary payloads. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** Per-partition batched decode: binary column → typed metadata.
    * This is the operator a real pipeline points at image/audio bytes. */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Frame size (bytes) and sampling stride for [[frameSample]] —
    * shared with the DuckDB mirror. */
  val FrameBytes = 64
  val FrameStride = 4

  /** Frame sampling over an opaque media payload: treat the binary as
    * a sequence of fixed-size frames and keep every `FrameStride`-th
    * one — the video-pipeline primitive (decode only sampled frames).
    * All-native plan: `sequence` + `explode` + binary `substring` +
    * `md5`, codegen throughout, embarrassingly parallel, and the
    * binary column is projected only here. The sampled frame is
    * emitted as its md5 (the downstream dedup/caching key a real
    * pipeline stores); a real decoder would consume `Frame` bytes
    * instead. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .withColumn("NBytes", octet_length(col("payload")))
      .withColumn("FrameIdx",
        // greatest(..., 0): an empty payload still yields frame 0 (of
        // empty bytes) — sequence(0, -1) would throw, and the oracle's
        // truncating (0-1)//64 = 0 emits that same single frame
        explode(sequence(lit(0),
          greatest(floor((col("NBytes") - 1) / FrameBytes), lit(0)).cast(IntegerType),
          lit(FrameStride))))
      .select(col("doc_id"), col("FrameIdx"),
        md5(expr(s"substring(payload, FrameIdx * $FrameBytes + 1, $FrameBytes)"))
          .as("FrameMd5"))
      .orderBy(col("doc_id"), col("FrameIdx"))

  /** Downsample factor for [[resize]] — shared with the mirror. */
  val ResizeFactor = 4

  /** Resize/downsample stub: keep every `ResizeFactor`-th payload byte
    * (the plumbing twin of an image downscale — a real resampler
    * replaces the kernel, the schema/partitioning/pruning shape is
    * identical). Emits the resized payload's size, md5 (the cache/dedup
    * key), and the metadata stub's dimensions scaled by the factor.
    * Native `filter` over a positions sequence + `substring` per kept
    * byte would be per-element interpreted; instead the kept bytes are
    * assembled in one codegen'd pass via the same mapPartitions seam as
    * [[byteFeatures]], with the ORACLE-facing columns pure functions of
    * exact integers and md5. */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val resized = payloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val kept = Array.range(0, b.length, ResizeFactor).map(b(_))
        (id, kept)
      })
      .toDF("doc_id", "resized")
    resized.select(col("doc_id"),
        octet_length(col("resized")).as("NBytesResized"),
        md5(col("resized")).as("ResizedMd5"))
      .withColumn("FakeWidthResized", (col("NBytesResized") % 317) + 1)
      .orderBy(col("doc_id"))
  }

  /** Fixed feature vector from a media payload (byte statistics). */
  case class ByteFeatures(doc_id: Long, n_bytes: Int, min_byte: Int,
                          max_byte: Int, sum_bytes: Long, mean_byte: Double)

  /** Feature extraction in the REAL batched shape: per-partition JVM
    * loop over the payload bytes (`mapPartitions`, same seam as
    * [[decodeMeta]] — a production embedding/feature model plugs in
    * here), exact integer statistics so the DuckDB oracle reproduces
    * them bit-for-bit. */
  def byteFeatures(spark: SparkSession, dir: String): Dataset[ByteFeatures] = {
    import spark.implicits._
    payloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        var mn = 256; var mx = -1; var s = 0L
        var i = 0
        while (i < b.length) {
          val v = b(i) & 0xff
          if (v < mn) mn = v
          if (v > mx) mx = v
          s += v
          i += 1
        }
        if (b.isEmpty) ByteFeatures(id, 0, 0, 0, 0L, 0.0)
        else ByteFeatures(id, b.length, mn, mx, s, s.toDouble / b.length)
      })
  }

  /** [[byteFeatures]] as a driver-contract query (oracle-compared). */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    byteFeatures(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes").as("NBytes"),
        col("min_byte").as("MinByte"), col("max_byte").as("MaxByte"),
        col("sum_bytes").as("SumBytes"), col("mean_byte").as("MeanByte"))
      .orderBy(col("doc_id"))

  /** Oracle-checkable twin of the metadata extraction: the same fake
    * decode expressed as pure Catalyst expressions (so DuckDB can
    * reproduce it; the mapPartitions path is covered by ScalaTest). */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).as("NBytes"),
      ascii(substring(col("text"), 1, 1)).as("FirstByte"))
      .withColumn("FakeWidth", (col("NBytes") % 317) + 1)
      .withColumn("FakeHeight", (col("FirstByte") * 7 % 97) + 1)
      .withColumn("AspectRatio",
        col("FakeWidth").cast(DoubleType) / col("FakeHeight"))
      .orderBy(col("doc_id"))
}
