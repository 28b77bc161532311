package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Test-scope avro container writer (the XlsxTestWriter pattern):
  * serializes a DataFrame to one avro object-container file with the
  * standard logical types (timestamp-micros, date), so SourcesSpec can
  * prove the from-scratch AvroSource reader round-trips the engine's
  * declared table schemas through a file a THIRD-party avro stack
  * would also read. */
object AvroTestWriter {

  private def avroType(dt: DataType): String = dt match {
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case DoubleType => "\"double\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case other => throw new IllegalArgumentException(s"no avro lane for $other")
  }

  /** `syncInterval`: approximate bytes per container block — the
    * split test forces a SMALL interval so one modest file holds many
    * sync-aligned blocks for the byte-range reader to divide. */
  def write(df: DataFrame, path: String,
            syncInterval: Int = 64 * 1024): Unit = {
    val fields = df.schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroType(f.dataType)}],"default":null}"""
    }.mkString(",")
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"row","fields":[$fields]}""")
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](avroSchema))
    writer.setSyncInterval(syncInterval)
    writer.create(avroSchema, new java.io.File(path))
    try df.collect().foreach { row =>
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      df.schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v: Any =
          if (row.isNullAt(i)) null
          else f.dataType match {
            case TimestampType =>
              val ts = row.getTimestamp(i)
              java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
            case DateType =>
              java.lang.Integer.valueOf(row.getDate(i).toLocalDate.toEpochDay.toInt)
            case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case _ => row.get(i)
          }
        rec.put(f.name, v)
      }
      writer.append(rec)
    } finally writer.close()
  }
}
