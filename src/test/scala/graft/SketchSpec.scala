package graft

import org.apache.spark.sql.functions._

import graft.etl.Transactions
import graft.ops.RelationalOps

/** Numeric error-bound checks for the sketch aggregates — the tighter
  * companions to the TRUE-boolean contract the DuckDB oracle asserts on
  * `sketch_approx_stats` (see RelationalOps.approxSketchStats scaladoc).
  */
class SketchSpec extends SparkSpec {

  test("sketch_approx_stats: every error-bound boolean is true") {
    val rows = RelationalOps.approxSketchStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    Seq("CustomersSketchOk", "OrdersSketchOk", "P50SketchOk", "P90SketchOk")
      .foreach { c =>
        assert(rows.forall(_.getAs[Boolean](c)), s"$c not uniformly true")
      }
  }

  test("HLL++ relative error <= 3x the configured rsd (0.02) per country") {
    val rows = Transactions.cleaned(spark, sfDir)
      .filter(!col("IsCancelled"))
      .groupBy(col("Country"))
      .agg(
        countDistinct(col("CustomerID")).as("ec"),
        approx_count_distinct(col("CustomerID"), 0.02).as("ac"),
        countDistinct(col("InvoiceNo")).as("eo"),
        approx_count_distinct(col("InvoiceNo"), 0.02).as("ao"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def check(exact: Long, approx: Long, what: String): Unit =
        assert(math.abs(approx - exact) <= exact * 0.06,
          s"$what HLL drift: exact=$exact approx=$approx in ${r.getString(0)}")
      check(r.getAs[Long]("ec"), r.getAs[Long]("ac"), "customers")
      check(r.getAs[Long]("eo"), r.getAs[Long]("ao"), "orders")
    }
  }

  test("percentile_approx value sits within ±0.1 rank of the target quantile") {
    val rows = Transactions.cleaned(spark, sfDir)
      .filter(!col("IsCancelled"))
      .groupBy(col("Country"))
      .agg(
        percentile_approx(col("TotalAmount"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("TotalAmount"), lit(0.9), lit(1000)).as("p90"),
        sort_array(collect_list(col("TotalAmount"))).as("vals"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vals = r.getSeq[Double](r.fieldIndex("vals"))
      val n = vals.size.toDouble
      def rankOk(v: Double, q: Double, what: String): Unit = {
        val hi = vals.count(_ <= v) / n // largest rank v could occupy
        val lo = vals.count(_ < v) / n  // smallest rank v could occupy
        assert(lo <= q + 0.1 + 1e-9 && hi >= q - 0.1 - 1e-9,
          s"$what rank [$lo,$hi] outside ${q}±0.1 in ${r.getString(0)}")
      }
      rankOk(r.getAs[Double]("p50"), 0.5, "p50")
      rankOk(r.getAs[Double]("p90"), 0.9, "p90")
    }
  }
}
