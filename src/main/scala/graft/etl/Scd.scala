package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Slowly-changing-dimension TYPE 2 maintenance — the classic
  * warehouse dimension-versioning kernel the reference's load stage
  * stops short of (etl.py loads flat tables; any real sales warehouse
  * versions its customer/product dims).
  *
  * Contract: `current` carries the dimension with history columns
  * (`Version`, `ValidFrom`, `ValidTo`, `IsCurrent`); `changes` carries
  * one row per key with NEW values for the tracked attributes. Keys
  * whose tracked attributes differ from their current row get that row
  * CLOSED (`ValidTo` = effective date, `IsCurrent` = false) and a new
  * `Version`+1 row opened; unchanged keys, no-op changes, and
  * historical rows pass through untouched.
  *
  * Scale shape: one equi-join of the current slice with the change
  * batch on the dimension key — the batch is ingest-sized, so the join
  * broadcasts; nothing else touches the dimension. In production the
  * dimension is bucketed on the key and the rewrite is partition-local
  * (the AggMaintenance pattern); this kernel is the relational algebra
  * those rewrites apply. Deterministic: pure column comparisons, no
  * timestamps generated inside (the effective date is a parameter).
  */
object Scd {

  /** Apply a type-2 change batch. `changes` must carry `key` plus the
    * `tracked` columns (new values); all other `current` columns are
    * carried forward into the new version rows. */
  def scd2Apply(current: DataFrame, changes: DataFrame, key: String,
                tracked: Seq[String], effective: Column): DataFrame = {
    val outCols = current.columns.map(col).toSeq
    val cur = current.filter(col("IsCurrent"))
    val hist = current.filter(!col("IsCurrent"))
    val renamed = tracked.foldLeft(
      changes.select((key +: tracked).map(col): _*))(
      (d, c) => d.withColumnRenamed(c, s"New_$c"))
    val joined = cur.join(renamed, Seq(key), "left")
    // a key with no change row, or a no-op change, is NOT a new version
    val differs = coalesce(
      tracked.map(c => col(s"New_$c") =!= col(c)).reduce(_ || _), lit(false))
    val unchanged = joined.filter(!differs).select(outCols: _*)
    val closed = joined.filter(differs)
      .withColumn("ValidTo", effective.cast(DateType))
      .withColumn("IsCurrent", lit(false))
      .select(outCols: _*)
    val opened = tracked.foldLeft(joined.filter(differs)) {
        (d, c) => d.withColumn(c, col(s"New_$c"))
      }
      .withColumn("Version", (col("Version") + 1).cast(IntegerType))
      .withColumn("ValidFrom", effective.cast(DateType))
      .withColumn("ValidTo", lit(null).cast(DateType))
      .withColumn("IsCurrent", lit(true))
      .select(outCols: _*)
    hist.union(unchanged).union(closed).union(opened)
  }

  /** Epoch of the synthetic dataset (dimension birth date). */
  val DimBirth = "1992-01-01"
  /** Effective date of the planted change batch. */
  val ChangeDate = "1998-01-01"

  /** The gate query: customers as a version-1 SCD2 dimension, with a
    * PLANTED deterministic change batch (the corpus ships no change
    * feed — the piiRedact pattern): every custkey ≡ 3 (mod 7) moves to
    * segment `SEG<key mod 5>`, exercising close + open + pass-through
    * in one result. The kernel itself ([[scd2Apply]]) is feed-agnostic. */
  def scd2Customers(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).select(
      col("c_custkey").as("CustKey"),
      col("c_mktsegment").as("Segment"),
      lit(1).cast(IntegerType).as("Version"),
      to_date(lit(DimBirth)).as("ValidFrom"),
      lit(null).cast(DateType).as("ValidTo"),
      lit(true).as("IsCurrent"))
    val changes = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("CustKey"),
        concat(lit("SEG"), (col("c_custkey") % 5).cast("string")).as("Segment"))
    scd2Apply(dim, changes, "CustKey", Seq("Segment"), to_date(lit(ChangeDate)))
      .orderBy(col("CustKey"), col("Version"))
  }
}
