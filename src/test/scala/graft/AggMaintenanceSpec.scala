package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.etl.Transactions
import graft.ops.AggMaintenance

/** Incremental aggregate maintenance: merging a fact batch into the
  * persisted monthly-partitioned rollup must equal a from-scratch
  * build over all facts, while physically rewriting ONLY the month
  * partitions the batch touches. */
class AggMaintenanceSpec extends SparkSpec {

  private def sales = Transactions.cleaned(spark, sfDir)
    .filter(!col("IsCancelled"))

  private def partitionState(base: String): Map[String, Seq[(String, Long)]] =
    Files.list(Paths.get(base)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("YM="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => (f.getFileName.toString, Files.size(f)))
            .toSeq.sortBy(_._1)
      }.toMap

  private def fileMd5s(base: String, ym: String): Seq[String] = {
    def md5(p: Path): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
    Files.list(Paths.get(base, ym)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString).map(md5)
  }

  test("maintain merges the batch exactly: maintained table == from-scratch aggregate") {
    val base = AggMaintenance.dailyAggPath(spark, sfDir) + "_spec_merge"
    val split = sales.agg(trunc(max(col("Date")), "MM").as("S")).head().getDate(0)
    AggMaintenance.buildDailyAgg(sales.filter(col("Date") < lit(split)), base)
    val affected = AggMaintenance.maintainDailyAgg(spark, base,
      sales.filter(col("Date") >= lit(split)))
    assert(affected.nonEmpty)
    val maintained = spark.read.parquet(base)
      .select(col("Date"), col("RevDec"), col("Items"), col("Lines"))
      .orderBy(col("Date")).collect()
    val full = AggMaintenance.dailyAggPath(spark, sfDir) + "_spec_full"
    AggMaintenance.buildDailyAgg(sales, full)
    val scratch = spark.read.parquet(full)
      .select(col("Date"), col("RevDec"), col("Items"), col("Lines"))
      .orderBy(col("Date")).collect()
    assert(maintained.map(_.toSeq).toSeq === scratch.map(_.toSeq).toSeq,
      "maintained aggregate diverges from the from-scratch build")
  }

  test("maintain rewrites only the affected month partitions, untouched ones byte-identical") {
    val base = AggMaintenance.dailyAggPath(spark, sfDir) + "_spec_parts"
    val split = sales.agg(trunc(max(col("Date")), "MM").as("S")).head().getDate(0)
    AggMaintenance.buildDailyAgg(sales.filter(col("Date") < lit(split)), base)
    val before = partitionState(base)
    assert(before.size > 1, "corpus must span multiple months for this test")
    val untouchedYm = before.keys.filterNot(_ == s"YM=${split.toString.substring(0, 7)}")
    val md5Before = untouchedYm.map(ym => ym -> fileMd5s(base, ym)).toMap
    val affected = AggMaintenance.maintainDailyAgg(spark, base,
      sales.filter(col("Date") >= lit(split)))
    assert(affected === Seq(split.toString.substring(0, 7)),
      s"batch confined to one month must affect exactly that month, got $affected")
    untouchedYm.foreach { ym =>
      assert(fileMd5s(base, ym) === md5Before(ym),
        s"untouched partition $ym was rewritten")
    }
    // and the affected month is now present
    assert(partitionState(base).contains(s"YM=${split.toString.substring(0, 7)}"))
  }

  test("empty batch is a no-op: no affected months, table untouched") {
    val base = AggMaintenance.dailyAggPath(spark, sfDir) + "_spec_empty"
    AggMaintenance.buildDailyAgg(sales, base)
    val before = partitionState(base)
    val affected = AggMaintenance.maintainDailyAgg(spark, base,
      sales.filter(lit(false)))
    assert(affected.isEmpty)
    assert(partitionState(base) === before)
  }

  test("driver query equals the plain full aggregate") {
    val got = AggMaintenance.incrementalDaily(spark, sfDir).collect()
    val expect = sales.groupBy(col("Date"))
      .agg(sum(col("TotalAmount").cast("decimal(18,4)")).cast("decimal(18,4)")
          .cast("double").as("Revenue"),
        sum(col("Quantity")).cast("long").as("Items"),
        count(lit(1)).as("Lines"))
      .orderBy(col("Date")).collect()
    assert(got.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
  }
}
