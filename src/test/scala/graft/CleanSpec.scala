package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.etl.Transactions

/** Unit tests for the cleaning stage's ⚠-trap semantics
  * (SURVEY.md §2.2; ref: data/etl.py:58-107). */
class CleanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("InvoiceNo", StringType),
    StructField("StockCode", StringType),
    StructField("Description", StringType, nullable = true),
    StructField("Quantity", LongType),
    StructField("InvoiceDate", TimestampType),
    StructField("UnitPrice", DoubleType),
    StructField("CustomerID", IntegerType, nullable = true),
    StructField("CountryRaw", StringType),
    StructField("TotalAmount", DoubleType),
    StructField("LineNumber", IntegerType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private def row(inv: String, desc: String, qty: Long, price: Double,
                  cust: Integer, country: String = "united kingdom",
                  when: String = "2011-03-15 10:30:00") =
    Row(inv, "85123", desc, qty, ts(when), price, cust, country, qty * price, 1)

  test("F1/F2: rows with null CustomerID or Description are dropped (etl.py:66,70)") {
    val df = mk(Seq(
      row("1001", "WIDGET", 2, 2.5, 17850),
      row("1002", null, 2, 2.5, 17850),
      row("1003", "WIDGET", 2, 2.5, null)))
    assert(Transactions.clean(df).count() === 1)
  }

  test("F5: cancelled rows kept as-is even with negative quantity (etl.py:79-84)") {
    val df = mk(Seq(
      row("C1001", "RETURNED", -3, 2.5, 17850), // cancelled, negative qty → KEPT
      row("1002", "BAD", 0, 2.5, 17850),        // not cancelled, qty=0 → dropped
      row("1003", "FREE", 5, 0.0, 17850),       // not cancelled, price=0 → dropped
      row("1004", "GOOD", 5, 2.5, 17850)))
    val out = Transactions.clean(df)
    assert(out.count() === 2)
    val cancelled = out.filter("IsCancelled").collect()
    assert(cancelled.length === 1 && cancelled(0).getAs[String]("InvoiceNo") === "C1001")
  }

  test("F9: DayOfWeek is Monday=0 like pandas dt.dayofweek, not Spark dayofweek (⚠W)") {
    // 2011-03-14 was a Monday, 2011-03-20 a Sunday
    val df = mk(Seq(
      row("1", "A", 1, 1.0, 1, when = "2011-03-14 09:00:00"),
      row("2", "A", 1, 1.0, 1, when = "2011-03-20 09:00:00")))
    val got = Transactions.clean(df).select("InvoiceNo", "DayOfWeek")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("1") === 0) // Monday
    assert(got("2") === 6) // Sunday
  }

  test("F12/F13: description uppercased, country title-cased (etl.py:99,102)") {
    val df = mk(Seq(row("1", "  nice mug  ", 1, 1.0, 1, country = "united kingdom")))
    val r = Transactions.clean(df).select("Description", "Country").head()
    assert(r.getString(0) === "NICE MUG")
    assert(r.getString(1) === "United Kingdom")
  }

  test("F13 oracle parity: multi-word names capitalize every word (initcap)") {
    // The DuckDB oracle mirrors initcap with a word-wise list_transform
    // over a space split (CoreSql.txnCte); this Scala port of that exact
    // expression must agree with Spark initcap on multi-word / repeated-
    // space / single-word inputs, or the oracle hash silently diverges
    // on data like real TPC-H 'UNITED KINGDOM'.
    def duckTitle(s: String): String =
      s.trim.toLowerCase.split(" ", -1)
        .map(w => if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1))
        .mkString(" ")
    val inputs = Seq("united kingdom", "UNITED KINGDOM", " czech republic ",
      "uk", "united  arab  emirates", "papua new guinea")
    val df = mk(inputs.zipWithIndex.map { case (c, i) =>
      row(s"${i + 1}", "A", 1, 1.0, 1, country = c)
    })
    val got = Transactions.clean(df).select("InvoiceNo", "Country")
      .collect().map(r => r.getString(0).toInt -> r.getString(1)).toMap
    inputs.zipWithIndex.foreach { case (c, i) =>
      assert(got(i + 1) === duckTitle(c), s"initcap divergence on '$c'")
    }
    assert(got(1) === "United Kingdom" && got(6) === "Papua New Guinea")
  }

  test("F8/F10/F11: date parts extracted from InvoiceDate (etl.py:92-96)") {
    val df = mk(Seq(row("1", "A", 1, 1.0, 1, when = "2011-12-09 17:45:00")))
    val r = Transactions.clean(df)
      .select("Year", "Month", "Hour", "Date").head()
    assert(r.getInt(0) === 2011 && r.getInt(1) === 12 && r.getInt(2) === 17)
    assert(r.getDate(3).toString === "2011-12-09")
  }
}
