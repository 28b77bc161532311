package graft.tools

import org.apache.spark.sql.functions._

/** Downstream stages of the FULL-corpus routed-kNN pipeline, driven
  * from the KEPT 100M-edge parquet (scale_artifacts/
  * knn20m_manifest.json) instead of re-paying the 1.00 h edge stage —
  * the r15 verdict's durable-artifact task: the graph is an artifact,
  * so its consumers must be measurable against it directly.
  *
  * Stages (each min-of-2, noop-materialized):
  *   - mutual: the knnGraphIvf reverse-edge join (minus the
  *     coalesce(1) presentation sort, which is gate-display shaping,
  *     not the operator);
  *   - rank profile: per-rank edge counts + cosine means — the
  *     integrity card (every rank 1..k carries one edge per query
  *     vector) and the quality-by-rank curve a curation pipeline
  *     reads off the graph.
  *
  * usage: runMain graft.tools.EdgeDownstreamProbe <edgesParquet>
  */
object EdgeDownstreamProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_scale/knn20m/edges")
    val spark = graft.GraftSession.local()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val edges = spark.read.parquet(path)
    val total = edges.count()
    println(f"[edgedown] edges=$total loadavg=" +
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
    def mutualDf = {
      val rev = edges.select(col("NId").as("RS"), col("SrcId").as("RT"))
      edges.join(rev,
          col("SrcId") === col("RS") && col("NId") === col("RT"), "left")
        .select(col("SrcId"), col("NId"), col("Cosine"), col("Rank"),
          col("RS").isNotNull.as("Mutual"))
    }
    val mutual = Seq(t(noop(mutualDf)), t(noop(mutualDf))).min
    println(f"[edgedown] mutual_stage_sec=$mutual%.1f")
    def rankDf = edges.groupBy(col("Rank"))
      .agg(count(lit(1)).as("Edges"), avg(col("Cosine")).as("MeanCosine"),
        min(col("Cosine")).as("MinCosine"))
      .orderBy(col("Rank"))
    val rank = Seq(t(noop(rankDf)), t(noop(rankDf))).min
    println(f"[edgedown] rank_profile_sec=$rank%.1f")
    rankDf.collect().foreach(r => println(
      f"[edgedown] rank=${r.getAs[Int]("Rank")} edges=${r.getAs[Long]("Edges")} " +
        f"mean_cos=${r.getAs[Double]("MeanCosine")}%.4f " +
        f"min_cos=${r.getAs[Double]("MinCosine")}%.4f"))
    spark.stop()
  }
}
