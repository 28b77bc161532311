package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable tabular-source seam (SURVEY.md §2.1 S1).
  *
  * The reference ingests an Excel workbook (`pd.read_excel`, ref:
  * data/etl.py:44-54); this engine's substrate is the driver's parquet
  * star schema. Both are instances of the same contract: "read one
  * table at `path` with a DECLARED schema" — never `inferSchema`, so
  * scans stay deterministic, columns prune, and a schema drift fails
  * loudly at read time instead of corrupting downstream types.
  *
  * Scale: each implementation returns a plain lazy scan (no
  * repartition/cache), so Catalyst pushes filters/projections into the
  * source and AQE sizes shuffles per query. A 100 TB deployment swaps
  * the source object, not the pipeline.
  */
trait TabularSource {
  def name: String
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame
}

/** Columnar default — the driver testdata substrate. */
object ParquetSource extends TabularSource {
  val name = "parquet"
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}

/** Header CSV with declared schema (the text-interchange path; also the
  * practical stand-in for spreadsheet exports in this offline image). */
object CsvSource extends TabularSource {
  val name = "csv"
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}

/** Excel plug point (S1). The reference reads `.xlsx` directly; Spark
  * has no built-in Excel reader and this zero-egress image ships no
  * connector jar, so this source FAILS LOUDLY rather than faking data.
  *
  * To enable on a real cluster, put an Excel DataSource V2 connector on
  * the classpath (e.g. the publicly available `spark-excel` package)
  * and replace the body with:
  * {{{
  *   spark.read.format("excel")          // connector's format name
  *     .option("header", "true")
  *     .schema(schema)
  *     .load(path)
  * }}}
  * Everything downstream (Transactions.rawFrom, clean, summaries,
  * sinks) is source-agnostic and unchanged — SourcesSpec proves the
  * pipeline is byte-identical under a source swap (parquet vs CSV).
  */
object ExcelSource extends TabularSource {
  val name = "excel"
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    throw new UnsupportedOperationException(
      "Excel source requires an Excel connector jar on the classpath " +
        "(none in this offline image) — see ExcelSource scaladoc for the " +
        "plug point; use CsvSource or ParquetSource here.")
}
