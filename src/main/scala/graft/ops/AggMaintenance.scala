package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Summaries, Transactions}

/** Incremental maintenance of a PERSISTED aggregate table (the
  * materialized-view upsert): a daily sales rollup partitioned by
  * month, refreshed per fact batch by merging the batch's partial
  * aggregates into ONLY the month partitions the batch touches —
  * dynamic partition overwrite, the same mechanism behind every
  * warehouse's `INSERT OVERWRITE ... PARTITION` refresh.
  *
  * The 100 TB contract: a nightly batch touching d days costs one
  * scan of the BATCH plus a re-aggregation of d affected month
  * partitions of the (already thousands-of-times smaller) aggregate
  * table — never a rescan of the full fact history. That only works
  * because every maintained column is DECOMPOSABLE (sum/count
  * re-aggregate associatively; the decimal revenue sum is exact, so
  * merge order is invisible). `countDistinct` columns are exactly the
  * ones this pattern CANNOT maintain — merging per-batch distinct
  * counts double-counts keys seen in both generations — which is why
  * the maintained rollup carries sums/counts only; a distinct-ish
  * column at scale rides a mergeable sketch instead
  * ([[graft.functions.KMinValues]], HLL), trading exactness for
  * maintainability.
  *
  * Layout notes: partitions are MONTHS (a day-partitioned aggregate
  * would create one directory per day — the small-files antidote
  * [[graft.etl.Load.writeCompacted]] exists for exactly that
  * mistake); sums are cast back to DECIMAL(18,4)/LONG before every
  * write so each generation lands the SAME parquet schema (Spark
  * widens `sum(decimal(18,4))` to decimal(28,4), and a second-level
  * sum to (38,4) — mixed-precision partition files would fail the
  * read-back schema merge).
  */
object AggMaintenance {

  private val dec = DecimalType(18, 4)

  /** Root for persisted aggregate tables: `SPARK_GRAFT_AGG_DIR` if
    * set, else `<spark.sql.warehouse.dir>/graft_agg` (same contract
    * as the IVF index root — never a cwd-relative literal). */
  private def aggRoot(spark: SparkSession): String =
    sys.env.getOrElse("SPARK_GRAFT_AGG_DIR",
      spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:") + "/graft_agg")

  /** Table location for a corpus dir: readable slug + md5 of the raw
    * dir (sanitization alone is lossy; the hash keeps it injective). */
  private[graft] def dailyAggPath(spark: SparkSession, dir: String): String = {
    val slug = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val h = graft.functions.TextExpressions.md5Hex(dir).substring(0, 8)
    s"${aggRoot(spark)}/daily_${slug}_$h"
  }

  /** Per-day decomposable partials of a fact slice — the ONLY shape
    * that may enter the maintained table. */
  private def partials(facts: DataFrame): DataFrame =
    facts.groupBy(col("Date"))
      .agg(
        sum(col("TotalAmount").cast(dec)).cast(dec).as("RevDec"),
        sum(col("Quantity")).cast(LongType).as("Items"),
        count(lit(1)).as("Lines"))
      .withColumn("YM", date_format(col("Date"), "yyyy-MM"))

  /** Full build (or rebuild): aggregate the fact slice and lay it out
    * partitioned by month. The pre-write repartition clusters each
    * month into one task (guide §6 — hash-distribute by the partition
    * key before a partitioned write): without it the AQE-coalesced
    * single aggregate task wrote every month directory SEQUENTIALLY
    * (~80 file creates at sf0.1), and at scale a task-per-month
    * writer is also what bounds files-per-directory at one. */
  def buildDailyAgg(facts: DataFrame, base: String): Unit = {
    // explicit width: a bare repartition(col) is AQE-coalescible, and
    // the coalescer folded the day-count-sized shuffle back into ONE
    // task that created every month directory sequentially (measured
    // 1.2 s of the gate wall). Day-level partials stay tiny at any
    // fact scale, so defaultParallelism bounds the file count per
    // directory at 1 while spreading the creates.
    val width = facts.sparkSession.sparkContext.defaultParallelism
    partials(facts).repartition(width, col("YM"))
      .write.mode("overwrite").partitionBy("YM").parquet(base)
  }

  /** Merge one fact batch into the persisted aggregate: batch partials
    * → affected months (a driver-side list of month strings — tiny by
    * construction) → read ONLY those partitions of the existing table,
    * re-aggregate old+new partials, and dynamically overwrite JUST the
    * affected month directories. Returns the affected months.
    *
    * The merged frame is `localCheckpoint`ed before the write: its
    * lineage reads the same partitions the write replaces, and
    * materializing first is what makes overwrite-what-you-read safe
    * (and keeps the failure unit clean — the checkpoint either
    * completed or the table is untouched). */
  def maintainDailyAgg(spark: SparkSession, base: String,
                       batchFacts: DataFrame): Seq[String] = {
    val bp = partials(batchFacts)
    val yms = bp.select(col("YM")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (yms.isEmpty) return yms
    val existing = spark.read.parquet(base)
      .filter(col("YM").isin(yms: _*))
      .select(col("Date"), col("RevDec"), col("Items"), col("Lines"), col("YM"))
    val merged = existing
      .unionByName(bp.select(col("Date"), col("RevDec"), col("Items"),
        col("Lines"), col("YM")))
      .groupBy(col("YM"), col("Date"))
      .agg(
        sum(col("RevDec")).cast(dec).as("RevDec"),
        sum(col("Items")).cast(LongType).as("Items"),
        sum(col("Lines")).cast(LongType).as("Lines"))
      .select(col("Date"), col("RevDec"), col("Items"), col("Lines"), col("YM"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("YM").parquet(base)
    yms
  }

  /** Driver-contract query: split the corpus into "history" (all days
    * before the final calendar month) and a "nightly batch" (the last
    * month), build the aggregate from history alone, merge the batch
    * in, and return the maintained table — which the oracle checks
    * against a from-scratch aggregate over ALL facts. The build is an
    * overwrite, so the query is rerun-safe (each invocation replays
    * the same build+maintain deterministically). */
  def incrementalDaily(spark: SparkSession, dir: String): DataFrame = {
    val sales = Transactions.cleaned(spark, dir)
      .filter(!col("IsCancelled"))
    // collected as a STRING: decoding a DateType row needs the active
    // session's codegen state, which Verify's worker threads lack
    val split = sales
      .agg(date_format(trunc(max(col("Date")), "MM"), "yyyy-MM-dd").as("S"))
      .head().getString(0)
    val base = dailyAggPath(spark, dir)
    buildDailyAgg(sales.filter(col("Date") < to_date(lit(split))), base)
    maintainDailyAgg(spark, base,
      sales.filter(col("Date") >= to_date(lit(split))))
    spark.read.parquet(base)
      .select(col("Date"), col("RevDec").cast(DoubleType).as("Revenue"),
        col("Items"), col("Lines"))
      .transform(Summaries.smallSort(_, col("Date")))
  }
}
