package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container source — the row-interchange format of
  * Kafka/ingest pipelines, on the [[Xlsx]] from-scratch precedent:
  * this image ships `org.apache.avro` (Spark's own runtime dependency)
  * but NOT the `spark-avro` connector, so the container format is read
  * directly.
  *
  * SPLITTING (round 12): files are carved into [[DefaultSplitBytes]]
  * byte ranges and each range reads the blocks whose SYNC-ALIGNED
  * start falls inside it — `DataFileReader.sync(start)` seeks to the
  * first 16-byte sync marker at/after the range start (the container
  * header itself ends with the file's sync marker, so `sync(0)` lands
  * on block 1), `pastSync(end)` hands the next block to the
  * neighboring split. Every block is read exactly once across splits
  * (the standard Hadoop Avro split contract, rebuilt here), so ONE
  * mega-container file now fans out across tasks instead of
  * serializing — the DataSourceV2 refinement the round-11 scaladoc
  * deferred, without the DSv2 plumbing. `DataFileReader` decodes
  * records LAZILY off the seekable stream, so a task holds one decode
  * buffer, not its byte range. Split size is tunable per session via
  * `spark.graft.avro.splitBytes` (the test forces tiny splits to
  * prove cross-split row identity).
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
/** Java-serializable envelope for a Hadoop `Configuration` (which is
  * `Writable`, not `Serializable`) — the standard broadcast-the-conf
  * pattern, written out via the conf's own `write`/`readFields`. */
private[sources] class SerializableHadoopConf(
    @transient private var c: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  def conf: org.apache.hadoop.conf.Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(in)
  }
}

object AvroSource extends TabularSource {
  val name = "avro"

  /** Default byte range per task — 32 MiB ≈ a few hundred 64 KiB avro
    * blocks, small enough that one rotated ingest file still fans out
    * across a node's cores, large enough that the per-split open +
    * sync scan is noise. */
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val splitBytes = spark.conf.getOption("spark.graft.avro.splitBytes")
      .map(_.toLong).getOrElse(DefaultSplitBytes)
    require(splitBytes > 0, s"spark.graft.avro.splitBytes must be > 0, got $splitBytes")
    // enumerate (file, length) on the driver with the session's FS —
    // same file/dir/glob surface binaryFiles accepted
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hpath)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.filter { st =>
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }.map(st => (st.getPath.toString, st.getLen))
    // an existing-but-empty ingest directory (rotation hasn't delivered
    // yet) is a normal state → empty frame with the declared schema;
    // a glob that matched NOTHING is a wrong path/pattern → loud error
    require(matched.nonEmpty, s"avro source matched no files under $path")
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val splits = files.flatMap { case (f, len) =>
      (0L until math.max(len, 1L) by splitBytes)
        .map(st => (f, st, math.min(st + splitBytes, len)))
    }
    // thread the SESSION's Hadoop conf to executors (S3A-style
    // credentials, HA nameservices, custom schemes): the same conf
    // that enumerated the files above opens them below — a fresh
    // executor-side `new Configuration()` would resolve a different
    // FS on any deployment whose filesystem needs session conf
    val bcConf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (file, start, end) =>
        val in = new org.apache.avro.mapred.FsInput(
          new org.apache.hadoop.fs.Path(file),
          bcConf.value.conf)
        val reader = org.apache.avro.file.DataFileReader.openReader(
          in,
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
          .asInstanceOf[org.apache.avro.file.DataFileReader[
            org.apache.avro.generic.GenericRecord]]
        val positions = names.map { n =>
          val f = reader.getSchema.getField(n)
          require(f != null, s"avro file $file is missing declared field '$n'")
          f.pos()
        }
        reader.sync(start)
        // lazy, closing on exhaustion: flatMap drains the iterator in
        // every full-scan path; an early `limit` abandons the stream
        // to GC, which is this RDD seam's usual trade
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = !reader.pastSync(end) && reader.hasNext
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
