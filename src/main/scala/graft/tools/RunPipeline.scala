package graft.tools


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
    val spark = graft.GraftSession.local(defaultCpus = 4)
    val t0 = System.nanoTime()
    val counts = Pipeline.run(spark, sfDir, outDir, formats)
    val secs = (System.nanoTime() - t0) / 1e9
    counts.toSeq.sortBy(_._1).foreach { case (name, n) => println(f"$name%-20s $n%10d rows") }
    println(f"completed in $secs%.1f s -> $outDir (${formats.mkString(",")})")
    spark.stop()
  }
}
