package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Sinks (SURVEY.md §2.1 S2-S7; ref: data/etl.py:264-386): CSV,
  * Parquet, and JDBC warehouse writes with the reference's per-sink
  * column conventions, plus the format-dispatching `load`.
  *
  * Scale: every writer is a distributed `df.write` — one file per
  * partition, no driver materialization. For warehouse-grade layouts,
  * [[writeParquetPartitioned]] adds partition pruning (`partitionBy`)
  * for downstream readers.
  */
object Load {

  /** S2 — CSV with headers (ref: etl.py:264-274). */
  def writeCsv(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", "true").csv(s"$outDir/csv/$name")
    }

  /** S3 — Parquet (ref: etl.py:276-290). The reference's str-cast of
    * object columns is a pandas-only workaround; Spark columns are
    * already typed. */
  def writeParquet(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/parquet/$name")
    }

  /** Partitioned parquet for scale: hive-style partition dirs enable
    * partition pruning for any downstream reader. */
  def writeParquetPartitioned(df: DataFrame, outDir: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)

  /** COMPACTED parquet write — the small-files antidote. A 100 TB
    * pipeline stage that inherits its parent's partitioning can emit
    * thousands of KB-sized files (one per task); downstream jobs then
    * pay a task per file and the namenode pays per object. This sizes
    * the output from the optimizer's own size estimate instead:
    * `ceil(stats.sizeInBytes / target)` partitions via round-robin
    * repartition (even sizes, no key skew). For plain scans the
    * estimate is the on-disk input size (× `fileCompressionFactor`),
    * which matches a rewrite's output closely; for derived plans it
    * is the optimizer's in-memory upper bound, so files land at or
    * under `targetMB`. Callers needing exact file sizes do a second
    * metadata-only pass. Returns the partition count it chose. */
  def writeCompacted(df: DataFrame, outDir: String, targetMB: Int = 128): Int = {
    require(targetMB >= 1, s"targetMB must be >= 1, got $targetMB")
    val target = BigInt(targetMB.toLong << 20)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (((bytes + target - 1) / target) max BigInt(1) min BigInt(1 << 20)).toInt
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** SQL-sink column conventions from the reference: lowercase names
    * (PostgreSQL, ref: etl.py:328) and HALF_EVEN 2dp rounding of
    * doubles (MySQL, ref: etl.py:356-357 — pandas `round` is
    * half-even, so `bround`, not `round`). */
  def sqlSinkShape(df: DataFrame, roundDoubles: Boolean): DataFrame = {
    val lowered = df.toDF(df.columns.map(_.toLowerCase): _*)
    if (!roundDoubles) lowered
    else lowered.schema.fields.filter(_.dataType == DoubleType)
      .foldLeft(lowered)((d, f) => d.withColumn(f.name, bround(col(f.name), 2)))
  }

  /** S4-S6 — JDBC warehouse write (SQLite/PostgreSQL/MySQL in the
    * reference; ref: etl.py:292-362). Database-agnostic: Spark's JDBC
    * dialect registry picks the DDL per URL. The sqlite/postgres/mysql
    * driver jars are not in this offline image, so the e2e test runs
    * the same code path against embedded Derby (PipelineSpec), which
    * ships with Spark. */
  def writeJdbc(tables: Map[String, DataFrame], url: String,
                props: java.util.Properties, roundDoubles: Boolean = false): Unit =
    tables.foreach { case (name, df) =>
      sqlSinkShape(df, roundDoubles).write.mode("overwrite").jdbc(url, name, props)
    }

  /** S7 — format dispatcher (ref: etl.py:364-386). */
  def load(tables: Map[String, DataFrame], outDir: String,
           formats: Seq[String] = Seq("csv", "parquet")): Unit =
    formats.foreach {
      case "csv" => writeCsv(tables, outDir)
      case "parquet" => writeParquet(tables, outDir)
      case other => throw new IllegalArgumentException(
        s"unknown sink format '$other' (jdbc sinks go through writeJdbc)")
    }
}
