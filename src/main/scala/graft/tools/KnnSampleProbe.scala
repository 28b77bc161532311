package graft.tools


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
  *          [nprobe] [K] [reps] [outDir]
  *   K defaults to round(√n) (the policy); the persisted index at K
  *   is built on first touch if absent (that build is reported
  *   separately — it is the amortized artifact, not the probe).
  *
  *   outDir (round 15, the full-run mode): write the edge stage to
  *   `outDir/edges` parquet instead of the noop sink, then run the
  *   downstream MUTUAL stage (the knnGraphIvf reverse-join, minus its
  *   presentation sort) from the WRITTEN parquet — so a
  *   sampleEvery=1 run leaves a real full-corpus graph on disk and
  *   times the downstream stage against real edges, not a
  *   projection. Per-rep shuffle-write and spill bytes come from a
  *   task-metrics listener (the disk story the r14 probe had to
  *   watch by hand). */
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
    val spark = graft.GraftSession.local()
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
    val outDir = if (args.length > 5) Some(args(5)) else None
    // task-metrics tallies: cumulative shuffle WRITE and disk SPILL
    // bytes — read per rep by delta, so the per-rep numbers isolate
    // each edge-stage run from the build's own shuffles
    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0)
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spilled.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    // Task-end events are delivered ASYNCHRONOUSLY on the listener
    // bus, so a snapshot taken the instant an action returns can
    // attribute a rep's late events to the next rep (advice r15).
    // Spark's bus-drain API is private; the observable equivalent is
    // tally quiescence — wait until both counters hold still for
    // 300 ms (5 s cap so a wedged bus cannot hang the probe; at that
    // point the skew is reported, not hidden, by the loadavg line).
    def drainTallies(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = (shuffleW.get, spilled.get)
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 300L * 1000 * 1000 &&
             System.nanoTime() < deadline) {
        Thread.sleep(50)
        val now = (shuffleW.get, spilled.get)
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
    }
    def gb(b: Long): String = f"${b / 1e9}%.1f GB"
    val tBuild0 = System.nanoTime()
    graft.ops.SimilarityOps.ivfIndexPath(spark, dir, k) // first touch builds
    println(f"[knnsample] index_touch ${(System.nanoTime() - tBuild0) / 1e9}%.1f s")
    for (i <- 1 to reps) {
      drainTallies()
      val (sw0, sp0) = (shuffleW.get, spilled.get)
      val t0 = System.nanoTime()
      val edges = graft.ops.SimilarityOps
        .knnGraphIvfEdges(spark, dir, nCentroids = k, nprobe = nprobe,
          sampleEvery = sampleEvery)
      outDir match {
        case Some(out) =>
          edges.write.mode("overwrite").parquet(s"$out/edges")
        case None =>
          edges.write.format("noop").mode("overwrite").save()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      drainTallies()
      println(f"[knnsample] rep $i $sec%8.2f s  " +
        f"sec_per_1e9_cand=${sec * 1e9 / candModel}%.2f  " +
        f"shuffle_write=${gb(shuffleW.get - sw0)}  " +
        f"spill=${gb(spilled.get - sp0)}  loadavg=" +
        scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
    }
    // full-run mode: the downstream mutual stage over the WRITTEN
    // graph (knnGraphIvf's reverse-join, minus the presentation sort
    // — a global order over n·KnnGraphK rows is display shaping, not
    // the operator)
    outDir.foreach { out =>
      import org.apache.spark.sql.functions.col
      drainTallies()
      val (sw0, sp0) = (shuffleW.get, spilled.get)
      val t0 = System.nanoTime()
      val edges = spark.read.parquet(s"$out/edges")
      val rev = edges.select(col("NId").as("RS"), col("SrcId").as("RT"))
      val mutual = edges
        .join(rev, col("SrcId") === col("RS") && col("NId") === col("RT"), "left")
        .select(col("SrcId"), col("NId"), col("Cosine"), col("Rank"),
          col("RS").isNotNull.as("Mutual"))
      mutual.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      drainTallies()
      println(f"[knnsample] mutual_stage $sec%8.2f s  " +
        f"shuffle_write=${gb(shuffleW.get - sw0)}  " +
        f"spill=${gb(spilled.get - sp0)}  loadavg=" +
        scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
      val frac = spark.read.parquet(s"$out/edges")
        .join(rev, col("SrcId") === col("RS") && col("NId") === col("RT"), "left_semi")
        .count()
      val total = spark.read.parquet(s"$out/edges").count()
      println(f"[knnsample] edges=$total mutual=$frac (${100.0 * frac / total}%.1f%%)")
    }
    spark.stop()
  }
}
