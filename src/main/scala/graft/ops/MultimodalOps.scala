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
