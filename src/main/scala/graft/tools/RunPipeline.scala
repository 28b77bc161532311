package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.Pipeline

/** CLI entry for the full ETL run (the `python etl.py` analog,
  * ref: data/etl.py:425-457): clean → summaries → sinks.
  *
  * Usage: runMain graft.tools.RunPipeline <sfDir> <outDir> [formats]
  * e.g.   runMain graft.tools.RunPipeline /root/testdata/sf0.001 /tmp/out csv,parquet
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <sfDir> <outDir> [csv,parquet]")
    val Array(sfDir, outDir) = args.take(2)
    val formats = if (args.length > 2) args(2).split(",").toSeq else Seq("csv", "parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val counts = Pipeline.run(spark, sfDir, outDir, formats)
    val secs = (System.nanoTime() - t0) / 1e9
    counts.toSeq.sortBy(_._1).foreach { case (name, n) => println(f"$name%-20s $n%10d rows") }
    println(f"completed in $secs%.1f s -> $outDir (${formats.mkString(",")})")
    spark.stop()
  }
}
