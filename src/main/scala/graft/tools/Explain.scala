package graft.tools


/** Dev tool: explain + time named SparkEntry queries.
  * usage: runMain graft.tools.Explain <sfDir> <query>[,query...] [--explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val spark = graft.GraftSession.local()
    // Same materialization as Bench: a noop write forces the full plan
    // (count() lets Catalyst prune projections/windows/sorts).
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    names.foreach { n => mat(graft.SparkEntry.queries(n)(spark, sfDir)) }
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (doExplain) { println(s"===== $n"); df.explain("formatted") }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mat(df)
        println(f"[time] $n run$i: ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
