package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end orchestration — the `SalesETLPipeline.run()` analog
  * (ref: data/etl.py:390-413): extract → clean → four summaries →
  * load, returning the summary row counts the reference prints
  * (ref: etl.py:415-422).
  *
  * Differences by design: everything before `load` is a lazy Catalyst
  * plan (the reference materializes eagerly at every step); the cleaned
  * table is cached once and shared by all four summaries (the reference
  * recomputes its cancelled-filter per summary, etl.py:114/154/181/210).
  */
object Pipeline {

  /** The five output tables keyed like the reference's
    * `transformed_data` dict (ref: etl.py:38-40, 146-257). */
  def transform(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val cleaned = Transactions.cleaned(spark, dir)
    Map(
      "transactions" -> cleaned,
      "customer_summary" -> Summaries.customerSummary(cleaned),
      "product_summary" -> Summaries.productSummary(cleaned),
      "daily_sales" -> Summaries.dailySales(cleaned),
      "country_summary" -> Summaries.countrySummary(cleaned))
  }

  /** Full run: returns per-table row counts (the reference's summary
    * dict, ref: etl.py:415-422). The default format list is the
    * reference's `csv/parquet/sqlite` (etl.py:367) — same default as
    * [[Load.load]], whose zero-config sqlite path lands an embedded-DB
    * warehouse at `outDir/sales_data.db`. */
  def run(spark: SparkSession, dir: String, outDir: String,
          formats: Seq[String] = Seq("csv", "parquet", "sqlite")): Map[String, Long] = {
    val tables = transform(spark, dir)
    Load.load(tables, outDir, formats)
    tables.map { case (name, df) => name -> df.count() }
  }
}
