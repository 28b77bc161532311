package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad: dissect aggregate-variant costs (round-3 sketch-gate
  * investigation). Not part of any query path. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val c = graft.etl.Transactions.cleaned(spark, sfDir)
      .filter(!col("IsCancelled"))
    c.count()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(df: => DataFrame): Unit = {
      noop(df) // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-36s ${times.map(x => f"$x%6.2f").mkString(" ")}")
    }
    val g = () => c.groupBy(col("Country"))
    t("countDistinct x2 + approx x2")(g().agg(
      countDistinct(col("CustomerID")).as("a"),
      approx_count_distinct(col("CustomerID"), 0.02).as("b"),
      countDistinct(col("InvoiceNo")).as("c"),
      approx_count_distinct(col("InvoiceNo"), 0.02).as("d")))
    t("percentile_approx scalar x2")(g().agg(
      percentile_approx(col("TotalAmount"), lit(0.5), lit(1000)).as("a"),
      percentile_approx(col("TotalAmount"), lit(0.9), lit(1000)).as("b")))
    t("percentile_approx array")(g().agg(
      percentile_approx(col("TotalAmount"), array(lit(0.5), lit(0.9)), lit(1000)).as("a")))
    t("percentile_disc x3")(g().agg(
      expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY TotalAmount)").as("a"),
      expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY TotalAmount)").as("b"),
      expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY TotalAmount)").as("c")))
    t("percentile exact array")(g().agg(
      percentile(col("TotalAmount"), array(lit(0.4), lit(0.6), lit(0.8))).as("a")))
    t("percentile exact scalar x3")(g().agg(
      percentile(col("TotalAmount"), lit(0.4)).as("a"),
      percentile(col("TotalAmount"), lit(0.6)).as("b"),
      percentile(col("TotalAmount"), lit(0.8)).as("c")))
    t("max only")(g().agg(max(col("TotalAmount")).as("a")))
    // product_summary shapes: Expand-based double-distinct vs two-level
    t("prod: expand 2x countDistinct")(
      c.groupBy(col("StockCode"), col("Description"))
        .agg(sum(col("Quantity")).as("q"),
          sum(col("TotalAmount").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("r"),
          countDistinct(col("InvoiceNo")).as("o"),
          countDistinct(col("CustomerID")).as("u")))
    t("prod: two-level + join") {
      val base = c.groupBy(col("StockCode"), col("Description"))
        .agg(sum(col("Quantity")).as("q"),
          sum(col("TotalAmount").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("r"))
      val o = c.select(col("StockCode"), col("Description"), col("InvoiceNo")).distinct()
        .groupBy(col("StockCode"), col("Description")).agg(count(lit(1)).as("o"))
      val u = c.select(col("StockCode"), col("Description"), col("CustomerID")).distinct()
        .groupBy(col("StockCode"), col("Description")).agg(count(lit(1)).as("u"))
      base.join(o, Seq("StockCode", "Description")).join(u, Seq("StockCode", "Description"))
    }
    spark.stop()
  }
}
