package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a FORCED [[graft.ops.SimilarityOps.buildIvfIndex]] on one
  * corpus — the measurement companion of the size-routed Lloyd
  * assignment (kmeansCentroids routes per-round past
  * HierAssignMinNK). Prints one JSON line with the wall seconds and
  * the written list count so the routed build is checked for
  * structural completeness (one list row per corpus vector), not just
  * speed.
  *
  * usage: runMain graft.tools.IndexBuildProbe <dir> [k]
  */
object IndexBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else graft.ops.SimilarityOps.DefaultNCentroids
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // this host shows multi-minute whole-VM stalls (see Bench
      // scaladoc): without these a stalled heartbeat kills the
      // in-process executor mid-measurement
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val base = graft.ops.SimilarityOps.buildIvfIndex(spark, dir, k)
    val sec = (System.nanoTime() - t0) / 1e9
    val lists = spark.read.parquet(s"$base/lists").count()
    println(f"""{"dir":"$dir","k":$k,"build_sec":$sec%.3f,"list_rows":$lists}""")
    spark.stop()
  }
}
