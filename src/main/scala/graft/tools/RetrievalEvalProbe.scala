package graft.tools


/** Dev probe: print the retrieval-quality eval table (RetrievalOps.
  * retrievalEval) for a testdata dir — used to sanity the metric
  * values before the gate row + mirror landed, and for the committed
  * PERFORMANCE.md numbers. */
object RetrievalEvalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local()
    graft.ops.RetrievalOps.retrievalEval(spark, sfDir).show(100, false)
    spark.stop()
  }
}
