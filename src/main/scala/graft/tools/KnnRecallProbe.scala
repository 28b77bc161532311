package graft.tools


/** Measures routed-kNN edge recall vs the exact graph as nprobe
  * varies — the sizing evidence for the `similarity_knn_graph_ivf`
  * gate parameters and the OpsSpec recall bound.
  *
  * usage: runMain graft.tools.KnnRecallProbe <sfDir> [nprobes] [K] [timeonly]
  *   K defaults to DefaultNCentroids; `timeonly` skips the exact-graph
  *   baseline (at 50k+ vectors the exact n² graph is the thing the
  *   routed path exists to avoid — timing it defeats the probe).
  */
object KnnRecallProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: runMain graft.tools.KnnRecallProbe <sfDir> [nprobes] [K] [timeonly]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val nprobes = if (args.length > 1 && args(1) != "-") args(1).split(",").map(_.toInt).toSeq
      else Seq(4, 6, 8, 10, 12)
    val k = if (args.length > 2) args(2).toInt
      else graft.ops.SimilarityOps.DefaultNCentroids
    val timeOnly = args.length > 3 && args(3) == "timeonly"
    // OVERRIDE floor only (round 14): the candidate-join exchanges
    // size themselves from (n, K, nprobe) inside the operators
    // (SimilarityOps.candidatePartitions), so this env var is no
    // longer required at the multi-million-vector decades — it just
    // raises the session floor every other exchange inherits
    val spark = graft.GraftSession.local()
    val exact: Set[(Long, Long)] =
      if (timeOnly) Set.empty
      else graft.ops.SimilarityOps.knnGraph(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("SrcId"), r.getAs[Long]("NId"))).toSet
    nprobes.foreach { np =>
      val t0 = System.nanoTime()
      val routed = graft.ops.SimilarityOps
        .knnGraphIvf(spark, sfDir, nCentroids = k, nprobe = np)
        .collect().map(r => (r.getAs[Long]("SrcId"), r.getAs[Long]("NId"))).toSet
      val recall =
        if (timeOnly) -1.0
        else (exact intersect routed).size.toDouble / exact.size
      println(f"[knnrecall] K=$k nprobe=$np%2d recall=$recall%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.2f s, |routed|=${routed.size})")
    }
    spark.stop()
  }
}
