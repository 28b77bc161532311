package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the retrieval-quality eval table (RetrievalOps.
  * retrievalEval) for a testdata dir — used to sanity the metric
  * values before the gate row + mirror landed, and for the committed
  * PERFORMANCE.md numbers. */
object RetrievalEvalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // this host shows multi-minute whole-VM stalls (see Bench
      // scaladoc): without these a stalled heartbeat kills the
      // in-process executor mid-measurement
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Verify.registerAll(spark)
    graft.ops.RetrievalOps.retrievalEval(spark, sfDir).show(100, false)
    spark.stop()
  }
}
