package graft.tools


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
    val spark = graft.GraftSession.local()
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
