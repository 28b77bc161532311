package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Event-stream (batch) operators over the `events` table: tumbling
  * windows, JSON extraction, exact dedup, sessionization.
  *
  * Determinism: `ts` is the ns-precision parquet column truncated to
  * microseconds identically to DuckDB's reader (Tables.events), so
  * every comparison/gap below is exact integer arithmetic on the same
  * instants. Timestamps are OUTPUT as formatted strings — parquet
  * timestamp zone semantics differ between writers, strings don't.
  *
  * Scale: all four are single-shuffle groupBy/window plans keyed on
  * user_id or (hour, type) — both high-cardinality, skew-free keys. The
  * streaming twins (true incremental state) live in
  * graft.streaming.EventsStream.
  */
object EventsOps {

  private val dec = DecimalType(18, 4)

  /** Tumbling 1-hour windows per event type (batch twin of the
    * Structured Streaming windowed agg). */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("HourTs"),
        col("event_type"))
      .agg(
        count(lit(1)).as("NEvents"),
        sum(col("value").cast(dec)).cast(DoubleType).as("TotalValue"))
      .orderBy(col("HourTs"), col("event_type"))

  /** JSON property extraction (`props` is a JSON string). Uses
    * regexp_extract rather than from_json so the exact same expression
    * is portable to the oracle; the engine also exposes
    * from_json-based parsing in the streaming module. */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1).cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("NEvents"),
        sum(col("k")).as("SumK"),
        min(col("k")).as("MinK"),
        max(col("k")).as("MaxK"))
      .transform(graft.etl.Summaries.smallSort(_, col("event_type")))

  /** Exact dedup: latest event per user (row_number = 1 over a total
    * per-user order). The canonical "keep newest version of each key"
    * pipeline op. */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("LastTs"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Sessionization with a 30-minute inactivity gap: lag + prefix-sum
    * of session-start flags, all in exact microsecond integers. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("NEvents"), sum(col("new_sess")).as("NSessions"))
      .orderBy(col("user_id"))
  }
}
