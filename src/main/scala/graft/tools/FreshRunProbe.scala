package graft.tools


/** Times N FRESH constructions+materializations of a named SparkEntry
  * query — the timing mode graft.Bench actually uses (each sample
  * calls the query function again), as opposed to BenchOne's
  * build-once/noop-thrice loop, which leaves construction-time work
  * (eager localCheckpoint materializations!) OUTSIDE the timed
  * region. The round-10 pHash lesson: BenchOne said 0.5 s while the
  * suite said 8.5 s because the eager checkpoint's interpreted DCT
  * pass ran at construction, single-partition under AQE coalescing.
  *
  * usage: runMain graft.tools.FreshRunProbe <sfDir> <query> [reps]
  */
object FreshRunProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.tools.FreshRunProbe <sfDir> <query> [reps]")
      sys.exit(2)
    }
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.local()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[freshrun] $name rep $i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
