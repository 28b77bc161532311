package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: why does/doesn't OptimizeSkewedJoin fire on the skew
  * demo join (round-3 investigation). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
      .config("spark.ui.enabled", "false")
      // this host shows multi-minute whole-VM stalls (see Bench
      // scaladoc): without these a stalled heartbeat kills the
      // in-process executor mid-measurement
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val df = graft.ops.RelationalOps.skewedOrderJoin(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    println("[skewprobe] final plan:\n" + plan)
    spark.stop()
  }
}
