package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: where does a dedup_components call spend its time —
  * edge construction (sketch + candidate join + verify) vs the
  * label-propagation rounds? Runs the stages separately, twice each
  * (second run rides the session sketch caches, like bench pass 2).
  *
  * usage: runMain graft.tools.ComponentsProbe <sfDir>
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (pass <- 1 to 2) {
      t(s"pass $pass: neardupPairs (edges input)")(
        graft.ops.DedupOps.neardupPairs(spark, sfDir).count())
      t(s"pass $pass: full components query")(
        graft.ops.DedupOps.components(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    // isolate the loop from the pairs plan: componentsOf over a
    // CACHED pair set — the residual is pure iteration + assembly
    val pairs = graft.ops.DedupOps.neardupPairs(spark, sfDir)
      .select(col("D1"), col("D2")).cache()
    pairs.count()
    val ids = graft.etl.Tables.documents(spark, sfDir).select(col("doc_id"))
    for (pass <- 1 to 3)
      t(s"pass $pass: componentsOf on cached pairs")(
        graft.ops.DedupOps.componentsOf(pairs, ids)
          .write.format("noop").mode("overwrite").save())
    // per-action anatomy of one componentsOf call (inline replica)
    locally {
      val bidir = pairs.toDF("D1", "D2")
      val touched = bidir.select(col("D1").as("doc_id"))
        .union(bidir.select(col("D2").as("doc_id"))).distinct()
      val edges0 = bidir.union(bidir.select(col("D2"), col("D1")))
        .union(touched.select(col("doc_id"), col("doc_id")))
        .toDF("src", "dst").cache()
      t("anatomy: edges0.count")(edges0.count())
      val e = edges0.repartition(1, col("src")).cache()
      t("anatomy: repartition count")(e.count())
      edges0.unpersist(false)
      var labels = e.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("ClusterId"))
      t("anatomy: seed checkpoint") { labels = labels.localCheckpoint() }
      def step(l: org.apache.spark.sql.DataFrame) =
        e.join(l.withColumnRenamed("doc_id", "src"), "src")
          .groupBy(col("dst"))
          .agg(min(col("ClusterId")).as("ClusterId"),
            min(when(col("src") === col("dst"), col("ClusterId"))).as("PrevId"))
          .select(col("dst").as("doc_id"), col("ClusterId"),
            (col("ClusterId") =!= col("PrevId")).as("Changed"))
      var converged = false
      var it = 0
      while (!converged && it < 10) {
        it += 1
        val next = step(step(labels).select(col("doc_id"), col("ClusterId")))
          .localCheckpoint(eager = false)
        t(s"anatomy: loop action $it") {
          converged = next.filter(col("Changed")).count() == 0L }
        labels = next.select(col("doc_id"), col("ClusterId"))
      }
      val out = ids.join(labels.withColumnRenamed("ClusterId", "P"),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("P"), col("doc_id")).as("ClusterId"))
      t("anatomy: final join noop")(
        out.write.format("noop").mode("overwrite").save())
      e.unpersist(false)
    }
    pairs.unpersist(false)
    spark.stop()
  }
}
