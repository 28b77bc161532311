package graft.tools

import org.apache.spark.sql.SparkSession

/** Pins the routed-kNN PER-CANDIDATE constant at full-corpus list
  * sizes without paying the full n²·nprobe/K budget: a deterministic
  * 1-in-`sampleEvery` query subset (vec_id % sampleEvery == 0) runs
  * the REAL edge stage — nprobe routing, Cid-keyed candidate join
  * against the full persisted lists, combinable topk_edges rank —
  * so the measured sec / candidate is the one the whole-corpus
  * projection multiplies out (the r12 20M projection rested on a
  * contended 500k run; this puts a measured point under it).
  *
  * usage: runMain graft.tools.KnnSampleProbe <dir> <sampleEvery>
  *          [nprobe] [K] [reps]
  *   K defaults to round(√n) (the policy); the persisted index at K
  *   is built on first touch if absent (that build is reported
  *   separately — it is the amortized artifact, not the probe).
  */
object KnnSampleProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.KnnSampleProbe <dir> <sampleEvery> [nprobe] [K] [reps]")
      sys.exit(2)
    }
    val dir = args(0)
    val sampleEvery = args(1).toLong
    // 0 would divide-by-zero in the query model below; <= 0 or 1
    // would silently run the FULL n²·nprobe/K workload while the
    // printed cand_model still pretended a sampled run
    if (sampleEvery < 1L) {
      System.err.println(s"sampleEvery must be >= 1 (got $sampleEvery); " +
        "1 = every vector queries (the full edge stage, no sampling)")
      sys.exit(2)
    }
    val nprobe = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        graft.functions.SketchAggregates.ObjectHashFallbackThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Verify.registerAll(spark)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val k = if (args.length > 3) args(3).toInt
      else math.round(math.sqrt(n.toDouble)).toInt
    val reps = if (args.length > 4) args(4).toInt else 3
    // ACTUAL sampled-query count (one vec_id-column scan), not the
    // n / sampleEvery approximation — the model below feeds the
    // published per-candidate constant, so it must not assume dense
    // vec_ids starting at 0 (the generated corpora happen to satisfy
    // that; a filtered or appended corpus would not)
    val nQueries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.lit(sampleEvery)) === 0L)
      .count()
    // the model the projection uses: each query scans nprobe lists of
    // ~n/K members
    val candModel = nQueries.toDouble * nprobe * (n.toDouble / k)
    println(f"[knnsample] n=$n K=$k nprobe=$nprobe sampleEvery=$sampleEvery " +
      f"queries=$nQueries cand_model=${candModel}%.3g")
    val tBuild0 = System.nanoTime()
    graft.ops.SimilarityOps.ivfIndexPath(spark, dir, k) // first touch builds
    println(f"[knnsample] index_touch ${(System.nanoTime() - tBuild0) / 1e9}%.1f s")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.ops.SimilarityOps
        .knnGraphIvfEdges(spark, dir, nCentroids = k, nprobe = nprobe,
          sampleEvery = sampleEvery)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[knnsample] rep $i $sec%8.2f s  " +
        f"sec_per_1e9_cand=${sec * 1e9 / candModel}%.2f  loadavg=" +
        scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
    }
    spark.stop()
  }
}
