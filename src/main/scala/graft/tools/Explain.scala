package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: explain + time named SparkEntry queries.
  * usage: runMain graft.tools.Explain <sfDir> <query>[,query...] [--explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    names.foreach { n => graft.SparkEntry.queries(n)(spark, sfDir).count() }
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (doExplain) { println(s"===== $n"); df.explain("formatted") }
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"[time] $n run$i: ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$c)")
      }
    }
    spark.stop()
  }
}
