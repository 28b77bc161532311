package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs a comma-separated list of SparkEntry queries IN ORDER on one
  * session, timing each fresh construction+materialization — the
  * instrument for suite-context effects (substrate caches built by
  * earlier queries, cache-manager lookup overhead on later big-plan
  * queries) that neither BenchOne nor FreshRunProbe can see.
  *
  * usage: runMain graft.tools.SeqRunProbe <sfDir> <q1,q2,...>
  */
object SeqRunProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.tools.SeqRunProbe <sfDir> <q1,q2,...>")
      sys.exit(2)
    }
    val Array(sfDir, list) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Verify.registerAll(spark)
    list.split(",").foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val cached = spark.sparkContext.getPersistentRDDs.size
      println(f"[seqrun] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (cachedRDDs=$cached)")
    }
    spark.stop()
  }
}
