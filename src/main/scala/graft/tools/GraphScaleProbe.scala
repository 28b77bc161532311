package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale axis for the graph family. The co-purchase graph caps at
  * sf0.1 (2.39M directed edges / 20k nodes), so the kernels' decade
  * claims — triangles' O(m^1.5) wedge bound, k-core's peel count vs
  * density, LPA/PageRank's edges×rounds — had no ≥10× corpus to run
  * against. This probe SYNTHESIZES one: a deterministic power-law
  * edge corpus (xxhash64-seeded, no RNG state — same args, same
  * graph) with genuine celebrity nodes (the node sampler's u³ skew
  * puts ~4% of raw endpoints on node 0, the exact hot-key shape the
  * degree orientation exists to survive), shaped into the SAME
  * degree-carrying substrate contract as GraphOps.coPurchaseEdges
  * (distinct, both directions, OutDeg window, cached) and driven
  * through the SAME kernels via the `*Of` forms.
  *
  * usage: runMain graft.tools.GraphScaleProbe <nNodes:nRawEdges>[,...]
  *   e.g. 20000:1200000,200000:12000000  (x1-comparable, x10)
  */
object GraphScaleProbe {

  /** Deterministic power-law-ish edge substrate: endpoint ids drawn
    * as floor(n·u³) (density ∝ x^{−2/3} — heavy low-id hubs), u from
    * xxhash64 of the edge index. Self-loops dropped, symmetrized,
    * distinct, degree-carrying, cached — bit-for-bit the
    * coPurchaseEdges substrate shape. */
  def powerlawEdges(spark: SparkSession, nNodes: Long, nRawEdges: Long): DataFrame = {
    def u01(salt: Int) =
      (pmod(xxhash64(col("id"), lit(salt)), lit(1000000000L)).cast(DoubleType)
        + lit(0.5)) / lit(1e9)
    def node(salt: Int) =
      least(lit(nNodes - 1),
        floor(lit(nNodes.toDouble) * pow(u01(salt), lit(3.0)))).cast(LongType)
    val raw = spark.range(nRawEdges)
      .select(node(1).as("A"), node(2).as("B"))
      .filter(col("A") =!= col("B"))
    raw.select(col("A").as("Src"), col("B").as("Dst"))
      .union(raw.select(col("B").as("Src"), col("A").as("Dst")))
      .distinct()
      .withColumn("OutDeg", count(lit(1)).over(Window.partitionBy(col("Src"))))
      .cache()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: runMain graft.tools.GraphScaleProbe <nNodes:nRawEdges>[,...] " +
          "[kernels: triangles,kcore,lpa,pagerank,bfs,degree_stats]")
      sys.exit(2)
    }
    val sizes = args(0).split(",").map { s =>
      val Array(n, m) = s.split(":").map(_.trim.toLong); (n, m)
    }
    val kernels: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet
      else Set("triangles", "kcore", "lpa", "pagerank", "bfs", "degree_stats")
    def on(k: String): Boolean = kernels.contains(k)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.GraphOps
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    sizes.foreach { case (n, m) =>
      val edges = powerlawEdges(spark, n, m)
      val dm = edges.count() // materialize the cache outside timings
      val maxDeg = edges.agg(max(col("OutDeg"))).first().getLong(0)
      println(f"[graphscale] corpus n=$n m_directed=$dm maxDeg=$maxDeg")
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      if (on("triangles")) {
        val tri = Seq(time(noop(GraphOps.trianglesOf(edges))),
          time(noop(GraphOps.trianglesOf(edges)))).min
        val triTotal = GraphOps.trianglesOf(edges)
          .agg(sum(col("NTriangles"))).first().getLong(0) / 3
        println(f"[graphscale] n=$n triangles_sec=$tri%.2f total=$triTotal")
        parts += f""""triangles_sec":$tri%.2f,"triangles_total":$triTotal"""
      }
      if (on("kcore")) {
        // peel depth is a corpus property: the probe bounds at 100, and
        // REPORTS the measured depth (the gate keeps its mirror-tied 12)
        var rounds = 0
        val kc = Seq(
          time { val (df, r) = GraphOps.kcoreWithRounds(edges, 100); rounds = r; noop(df) },
          time { val (df, r) = GraphOps.kcoreWithRounds(edges, 100); rounds = r; noop(df) }).min
        println(f"[graphscale] n=$n kcore_sec=$kc%.2f rounds=$rounds")
        parts += f""""kcore_sec":$kc%.2f,"kcore_rounds":$rounds"""
      }
      if (on("lpa")) {
        val lpa = Seq(time(noop(GraphOps.labelPropagationOf(edges))),
          time(noop(GraphOps.labelPropagationOf(edges)))).min
        println(f"[graphscale] n=$n lpa_sec=$lpa%.2f")
        parts += f""""lpa_sec":$lpa%.2f"""
      }
      if (on("pagerank")) {
        val pr = Seq(time(noop(GraphOps.pagerankOf(edges))),
          time(noop(GraphOps.pagerankOf(edges)))).min
        parts += f""""pagerank_sec":$pr%.2f"""
      }
      if (on("bfs")) {
        // frontier-delta vs full-state BFS: same distances
        // (RetrievalGraphSpec asserts bit-identity on both corpus
        // shapes), this prints the per-round volume story — frontier
        // sizes vs the cumulative settled counts the full-state form
        // re-joins every round
        var fsizes: Seq[Long] = Nil
        val bfs = Seq(
          time { val (df, s) = GraphOps.bfsHopsWithRounds(edges); fsizes = s; noop(df) },
          time { val (df, s) = GraphOps.bfsHopsWithRounds(edges); fsizes = s; noop(df) }).min
        val bfsFull = Seq(
          time(noop(GraphOps.bfsHopsOf(edges, frontierDelta = false))),
          time(noop(GraphOps.bfsHopsOf(edges, frontierDelta = false)))).min
        val cum = fsizes.scanLeft(0L)(_ + _).tail
        println(s"[graphscale] n=$n bfs frontier_sizes=${fsizes.mkString(",")} " +
          s"full_state_joins=${cum.init.mkString(",")}")
        parts += f""""bfs_sec":$bfs%.2f,"bfs_full_sec":$bfsFull%.2f"""
      }
      if (on("degree_stats")) {
        val ds = Seq(time(noop(GraphOps.degreeStatsOf(edges))),
          time(noop(GraphOps.degreeStatsOf(edges)))).min
        parts += f""""degree_stats_sec":$ds%.2f"""
      }
      println(s"""{"n":$n,"m_directed":$dm,"max_deg":$maxDeg,""" +
        parts.mkString(",") + "}")
      edges.unpersist()
    }
    spark.stop()
  }
}
