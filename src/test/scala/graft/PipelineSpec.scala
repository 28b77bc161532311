package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Load, Pipeline}

/** End-to-end pipeline + sink tests (ref: etl.py:390-413, 264-386). */
class PipelineSpec extends SparkSpec {

  test("run(): five tables, sane cardinalities, csv+parquet written") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val counts = Pipeline.run(spark, sfDir, out)
    assert(counts.keySet === Set("transactions", "customer_summary",
      "product_summary", "daily_sales", "country_summary"))
    assert(counts("transactions") === 6000L)
    assert(counts("customer_summary") === 150L)
    assert(counts("country_summary") === 25L)
    // parquet roundtrip preserves values
    val rt = spark.read.parquet(s"$out/parquet/country_summary")
    assert(rt.count() === 25L)
    // csv written with header
    val csv = spark.read.option("header", "true").csv(s"$out/csv/country_summary")
    assert(csv.count() === 25L && csv.columns.contains("TotalRevenue"))
  }

  test("sqlSinkShape: lowercase names + bround half-even (⚠R, etl.py:328,356)") {
    import spark.implicits._
    val df = Seq((1, 2.675, 2.665)).toDF("Id", "A", "B")
    val shaped = Load.sqlSinkShape(df, roundDoubles = true)
    assert(shaped.columns.toSeq === Seq("id", "a", "b"))
    val r = shaped.head()
    // bround is HALF_EVEN on the shortest decimal representation
    assert(r.getDouble(1) === 2.68) // 2.675 -> .675 rounds to even .68
    assert(r.getDouble(2) === 2.66) // 2.665 -> rounds to even .66
  }

  test("partitioned parquet write enables partition pruning layout") {
    val out = Files.createTempDirectory("graft_part").toString
    val daily = Pipeline.transform(spark, sfDir)("daily_sales")
      .withColumn("year", year(col("Date")))
    Load.writeParquetPartitioned(daily, out, Seq("year"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("year=")))
    assert(spark.read.parquet(out).filter(col("year") === 1995).count() > 0)
  }
}
