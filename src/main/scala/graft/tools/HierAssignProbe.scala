package graft.tools

import org.apache.spark.sql.functions.col

/** Scale probe for the hierarchical-assignment variant: time
  * `semanticDedup` (flat n·K assignment baked into the persisted
  * lists) vs `semanticDedupHierarchical` (n·√K·(nprobe+1) two-level
  * assignment) at one (dir, K), plus the two assignments' agreement
  * fraction — the measured basis for the n^1.25-vs-n^1.5 claim in
  * PERFORMANCE.md round 8.
  *
  * usage: runMain graft.tools.HierAssignProbe <dir> [K] [nprobe]
  */
object HierAssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 160
    val nprobe = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.local()
    import graft.ops.SimilarityOps
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // build-if-absent the persisted index DIRECTLY — the old warmup
    // ran the full semanticDedup, whose n²/K intra-cluster pair join
    // is quadratic work this probe doesn't measure (at 2M×K=512 that
    // is ~7.8e9 cosine evals — it starved the driver before the race
    // even started); the assignment race needs only codebook + lists
    val base = SimilarityOps.ivfIndexPath(spark, dir, k)
    val vecs = spark.read.parquet(s"$base/lists")
      .select(col("vec_id"), col("Q"), col("NormSq"))
    val cent = spark.read.parquet(s"$base/codebook")
    noop(SimilarityOps.assignFlat(vecs, cent))
    noop(SimilarityOps.assignHierarchical(vecs, cent, nprobe))
    // the measured quantity is the ASSIGNMENT pass itself — flat's is
    // otherwise hidden inside the index build
    val flatS = Seq(
      time(noop(SimilarityOps.assignFlat(vecs, cent))),
      time(noop(SimilarityOps.assignFlat(vecs, cent)))).min
    val hierS = Seq(
      time(noop(SimilarityOps.assignHierarchical(vecs, cent, nprobe))),
      time(noop(SimilarityOps.assignHierarchical(vecs, cent, nprobe)))).min
    val flatAssign = spark.read.parquet(s"$base/lists")
      .select(col("vec_id"), col("Cid").cast("long").as("FlatCid"))
    val hierAssign = SimilarityOps.assignHierarchical(
      spark.read.parquet(s"$base/lists").select(col("vec_id"), col("Q"), col("NormSq")),
      spark.read.parquet(s"$base/codebook"), nprobe)
      .select(col("vec_id"), col("Cid").as("HierCid"))
    val joined = flatAssign.join(hierAssign, "vec_id")
    val n = joined.count()
    val agree = joined.filter(col("FlatCid") === col("HierCid")).count()
    println(f"""{"dir":"$dir","k":$k,"nprobe":$nprobe,"flat_sec":$flatS%.3f,"hier_sec":$hierS%.3f,"agreement":${agree.toDouble / n}%.4f,"n":$n}""")
    spark.stop()
  }
}
