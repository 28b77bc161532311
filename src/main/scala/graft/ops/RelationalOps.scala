package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Tables, Transactions}

/** Relational-surface operators beyond the reference's repertoire:
  * rollup/grouping sets, set operations, and as-of (most-recent-prior)
  * semantics — the remaining families a user of a complete engine
  * expects (SURVEY.md §2.6 notes the reference has none of these).
  */
object RelationalOps {

  private val dec = DecimalType(18, 4)

  /** ROLLUP (Country, Year): per-(country, year), per-country, and
    * grand-total revenue in one pass — Spark plans this as a single
    * Expand + hash aggregate (no N-pass union).
    * GroupingId: 0 = leaf, 1 = per-country subtotal, 3 = grand total. */
  def rollupCountryYear(spark: SparkSession, dir: String): DataFrame =
    Transactions.cleaned(spark, dir)
      .filter(!col("IsCancelled"))
      .rollup(col("Country"), col("Year"))
      .agg(
        sum(col("TotalAmount").cast(dec)).cast(DoubleType).as("TotalRevenue"),
        countDistinct(col("InvoiceNo")).as("TotalOrders"),
        grouping_id().cast(LongType).as("GroupingId"))
      .orderBy(col("GroupingId"), asc_nulls_first("Country"), asc_nulls_first("Year"))

  /** Set difference: customers active in 1995 but not in 1996
    * (EXCEPT — planned as a left-anti aggregate join). */
  def churnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val in95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")).distinct()
    val in96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
    in95.except(in96).orderBy(col("o_custkey"))
  }

  /** As-of semantics over the event stream: for every purchase, the
    * most recent STRICTLY PRIOR view by the same user (the classic
    * time-series as-of join, here composed from a bounded window
    * instead of a custom operator — preference (a) in the design
    * order). Exact microsecond integer arithmetic throughout. */
  def purchaseAsofView(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("LastViewUs",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("PurchaseTs"),
        date_format(timestamp_micros(col("LastViewUs")), "yyyy-MM-dd HH:mm:ss").as("LastViewTs"),
        (col("us") - col("LastViewUs")).as("GapMicros"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Approximate/sketch aggregates — the at-scale substitutes for exact
    * distinct counts and sorts: HyperLogLog++ (`approx_count_distinct`,
    * mergeable across partitions, O(1) memory) and quantile sketches
    * (`percentile_approx`). At 100 TB these replace the exact
    * countDistinct double-shuffle wherever a bounded relative error is
    * acceptable.
    *
    * Correctness contract: sketch VALUES are engine-specific, so the
    * output carries (a) the exact columns, which the DuckDB oracle
    * recomputes, and (b) per-sketch error-bound BOOLEANS the oracle
    * states as literal TRUE — HLL relative error ≤ 3×rsd (rsd = 0.02),
    * approx-percentile value within the exact discrete 0.4/0.6 (resp.
    * 0.8/1.0) quantiles, a ±0.1 rank window that dwarfs the sketch's
    * 1/accuracy = 0.001 rank-error guarantee. A false boolean (sketch
    * out of bound) hash-mismatches the oracle row, so the driver gate
    * now genuinely checks the sketches instead of skipping them.
    * SketchSpec asserts the tighter numeric bounds on the raw values. */
  def approxSketchStats(spark: SparkSession, dir: String): DataFrame =
    Transactions.cleaned(spark, dir)
      .filter(!col("IsCancelled"))
      .groupBy(col("Country"))
      .agg(
        countDistinct(col("CustomerID")).as("ExactCustomers"),
        approx_count_distinct(col("CustomerID"), 0.02).as("ac"),
        countDistinct(col("InvoiceNo")).as("ExactOrders"),
        approx_count_distinct(col("InvoiceNo"), 0.02).as("ao"),
        percentile_approx(col("TotalAmount"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("TotalAmount"), lit(0.9), lit(1000)).as("p90"),
        expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY TotalAmount)").as("lo50"),
        expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY TotalAmount)").as("hi50"),
        expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY TotalAmount)").as("lo90"),
        max(col("TotalAmount")).as("hi90"))
      .select(
        col("Country"), col("ExactCustomers"), col("ExactOrders"),
        (abs(col("ac") - col("ExactCustomers"))
          <= col("ExactCustomers") * lit(0.06)).as("CustomersSketchOk"),
        (abs(col("ao") - col("ExactOrders"))
          <= col("ExactOrders") * lit(0.06)).as("OrdersSketchOk"),
        (col("p50") >= col("lo50") && col("p50") <= col("hi50")).as("P50SketchOk"),
        (col("p90") >= col("lo90") && col("p90") <= col("hi90")).as("P90SketchOk"))
      .orderBy(col("Country"))

  /** The testdata's order-date span (1995-2001); pivot columns are a
    * DECLARED list so the plan is one pass (no extra distinct-values
    * job, and stable schema under any data subset). */
  private val PivotYears = 1995 to 2001

  /** PIVOT: revenue by country × year, years as columns — Spark's
    * `pivot` with explicit values plans a single hash aggregate with
    * conditional sums (no per-year scans, no values-discovery job).
    * Empty cells stay NULL (no coalesce), matching the SQL CASE-sum
    * mirror. */
  def pivotCountryYear(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Transactions.cleaned(spark, dir)
      .filter(!col("IsCancelled"))
      .groupBy(col("Country"))
      .pivot("Year", PivotYears.map(_.asInstanceOf[AnyRef]))
      .agg(sum(col("TotalAmount").cast(dec)).cast(DoubleType))
    PivotYears.foldLeft(pivoted) { (df, y) =>
      df.withColumnRenamed(y.toString, s"Rev$y")
    }.orderBy(col("Country"))
  }

  /** Set intersection: customers active in BOTH 1995 and 1996
    * (INTERSECT — planned as a left-semi aggregate join). */
  def returningCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val in95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")).distinct()
    val in96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
    in95.intersect(in96).orderBy(col("o_custkey"))
  }

  /** Regex tokenization counts (punctuation-robust "BPE-ish" proxy) —
    * codegen'd regexp_extract_all, no UDF. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("NAlpha"),
      size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("NNonSpace"))
      .orderBy(col("doc_id"))
}
