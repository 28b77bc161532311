package graft.tools

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One-off probe: does the IVF probe→lists join actually prune the
  * Cid-partitioned list files (DPP or static), and how many partitions
  * does the lists scan read? */
object IvfPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(defaultCpus = 8)
    val df = graft.ops.SimilarityOps.ivfTopk(spark, sfDir)
    df.collect()
    println("=== executed plan ===")
    println(df.queryExecution.executedPlan.toString.take(12000))
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allScans(r.child)
      }.flatten
    val scans = allScans(df.queryExecution.executedPlan)
    scans.foreach { f =>
      println(s"scan: ${f.tableIdentifier} relation=${f.relation.location.rootPaths.mkString(",")}")
      println(s"  partitionFilters: ${f.partitionFilters}")
      println(s"  dataFilters: ${f.dataFilters}")
      println(s"  metrics numFiles=${f.metrics.get("numFiles").map(_.value)} " +
        s"partitionsRead=${f.metrics.get("numPartitions").map(_.value)} " +
        s"staticPartitions=${f.metrics.get("staticFilesNum").map(_.value)}")
    }
    val base = graft.ops.SimilarityOps.ivfIndexPath(spark, sfDir)
    val nParts = new java.io.File(s"$base/lists").listFiles()
      .count(_.getName.startsWith("Cid="))
    val route = graft.ops.SimilarityOps.probedListIds(spark, sfDir)
    println(s"lists has $nParts Cid= partitions on disk; route = ${route.mkString(",")} (${route.length})")
    spark.stop()
  }
}
