package graft.tools


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
    val spark = graft.GraftSession.local()
    val t0 = System.nanoTime()
    val base = graft.ops.SimilarityOps.buildIvfIndex(spark, dir, k)
    val sec = (System.nanoTime() - t0) / 1e9
    val lists = spark.read.parquet(s"$base/lists").count()
    println(f"""{"dir":"$dir","k":$k,"build_sec":$sec%.3f,"list_rows":$lists}""")
    spark.stop()
  }
}
