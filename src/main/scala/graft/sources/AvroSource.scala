package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container source — the row-interchange format of
  * Kafka/ingest pipelines, on the [[Xlsx]] from-scratch precedent:
  * this image ships `org.apache.avro` (Spark's own runtime dependency)
  * but NOT the `spark-avro` connector, so the container format is read
  * directly. `binaryFiles` distributes one container FILE per task —
  * the natural shard unit of an avro corpus (ingest pipelines write
  * many rotated files; block-level splitting inside one file is the
  * DataSourceV2 refinement a mega-file deployment would add) — and
  * `DataFileStream` decodes records LAZILY off the stream, so a task
  * holds one decode buffer, not the whole file.
  *
  * Fields map by NAME onto the declared schema (avro's own contract —
  * container files are self-describing and field order is not part of
  * the format's compatibility rules, unlike the positional CSV/xlsx
  * header convention): a declared field absent from the file fails
  * loudly at read time, the S1 seam's no-silent-drift rule. Supported
  * lanes: int/long/double/float→double/boolean/string/bytes, plus
  * long logicalType `timestamp-micros` → TimestampType and int
  * `date` → DateType — the engine's table-schema surface. Anything
  * else is a loud per-field error, never a null. */
object AvroSource extends TabularSource {
  val name = "avro"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val reader = new org.apache.avro.file.DataFileStream(
          pds.open(),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val positions = names.map { n =>
          val f = reader.getSchema.getField(n)
          require(f != null, s"avro file $file is missing declared field '$n'")
          f.pos()
        }
        // lazy, closing on exhaustion: flatMap drains the iterator in
        // every full-scan path; an early `limit` abandons the stream
        // to GC, which is the binaryFiles contract's usual trade
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(names.indices.map { i =>
              convert(rec.get(positions(i)), types(i), names(i))
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def convert(v: Any, dt: DataType, field: String): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (i: Integer, IntegerType) => i
    case (l: java.lang.Long, LongType) => l
    case (i: Integer, LongType) => java.lang.Long.valueOf(i.longValue())
    case (d: java.lang.Double, DoubleType) => d
    case (f: java.lang.Float, DoubleType) => java.lang.Double.valueOf(f.doubleValue())
    case (b: java.lang.Boolean, BooleanType) => b
    case (l: java.lang.Long, TimestampType) =>
      // avro logicalType timestamp-micros: micros since epoch
      val micros = l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (i: Integer, DateType) =>
      // avro logicalType date: days since epoch
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val d = bb.duplicate()
      val a = new Array[Byte](d.remaining())
      d.get(a)
      a
    case (x, t) => throw new IllegalArgumentException(
      s"avro field '$field': value of ${x.getClass.getName} is not convertible to ${t.simpleString}")
  }
}
