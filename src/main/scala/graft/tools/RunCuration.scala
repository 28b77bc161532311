package graft.tools


import graft.ops.CurateOps

/** CLI entry for the one-call corpus-curation pipeline: train split →
  * decontaminate → stratified sample → quality+repetition filter →
  * near-dup survivor → token-budget pack → parquet, printing the
  * per-stage funnel.
  *
  * Usage: runMain graft.tools.RunCuration <sfDir> <outDir> [minSharedShingles] [minQuality] [tokenBudget]
  * e.g.   runMain graft.tools.RunCuration /root/testdata/sf0.001 /tmp/curated 10
  *
  * Thresholds are corpus-tuned config (the library defaults are
  * deliberately strict): on the synthetic testdata the train/eval
  * vocabulary overlap is near-universal, so `minSharedShingles=10`
  * drops only the worst leakers (the CurateTextSpec setting) where the
  * default of 1 empties the funnel at the decontamination stage.
  */
object RunCuration {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 5,
      "usage: RunCuration <sfDir> <outDir> [minSharedShingles] [minQuality] [tokenBudget]")
    val Array(sfDir, outDir) = args.take(2)
    val minShared = if (args.length > 2) args(2).toInt else CurateOps.ContaminationMinShingles
    val minQuality = if (args.length > 3) args(3).toDouble else CurateOps.MinQuality
    val budget = if (args.length > 4) args(4).toLong else CurateOps.TokenBudget
    val spark = graft.GraftSession.local(defaultCpus = 4)
    val funnel = CurateOps.runCurationPipeline(spark, sfDir, outDir,
      minSharedShingles = minShared, minQuality = minQuality, budget = budget)
    val width = funnel.map(_._1.length).max
    funnel.foreach { case (stage, n) =>
      println(s"[curate] ${stage.padTo(width, ' ')}  $n")
    }
    println(s"[curate] curated corpus written to $outDir")
    spark.stop()
  }
}
