package graft

import java.nio.file.Files

import graft.etl.{Tables, Transactions}
import graft.sources.{CsvSource, ExcelSource, ParquetSource}

/** S1 source-seam tests: the pipeline must be byte-identical under a
  * source swap, and the Excel plug point must fail loudly rather than
  * fake data (ref: data/etl.py:44-54 reads .xlsx). */
class SourcesSpec extends SparkSpec {

  private val starTables = Seq("lineitem", "orders", "customer", "nation", "part")
  private val totalOrder =
    Seq("InvoiceNo", "LineNumber", "StockCode", "Quantity", "TotalAmount", "UnitPrice")

  test("CSV-sourced pipeline equals parquet-sourced pipeline row-for-row") {
    val dir = Files.createTempDirectory("graft_csv_src").toString
    starTables.foreach { n =>
      Tables.via(ParquetSource, spark, sfDir, n)
        .write.mode("overwrite").option("header", "true").csv(s"$dir/$n.csv")
    }
    def collectCleaned(raw: org.apache.spark.sql.DataFrame) =
      Transactions.clean(raw)
        .orderBy(totalOrder.head, totalOrder.tail: _*)
        .collect().map(_.toSeq).toSeq
    val fromCsv = collectCleaned(Transactions.rawFrom(
      Tables.via(CsvSource, spark, dir, "lineitem"),
      Tables.via(CsvSource, spark, dir, "orders"),
      Tables.via(CsvSource, spark, dir, "customer"),
      Tables.via(CsvSource, spark, dir, "nation"),
      Tables.via(CsvSource, spark, dir, "part")))
    val fromParquet = collectCleaned(Transactions.raw(spark, sfDir))
    assert(fromCsv.length === 6000)
    assert(fromCsv === fromParquet)
  }

  test("Excel source fails loudly and names the plug point") {
    val e = intercept[UnsupportedOperationException] {
      ExcelSource.read(spark, "/tmp/retail.xlsx", Tables.schemas("orders"))
    }
    assert(e.getMessage.contains("connector"))
  }
}
