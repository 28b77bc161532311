package graft

import graft.ops.RelationalOps

/** Skew hardening: AQE's OptimizeSkewedJoin must split the hot
  * partition of a deliberately skewed join (one key = ~50% of the fact
  * rows) and produce values identical to the unsplit join. Thresholds
  * are lowered to make the tiny test corpus register as skewed — the
  * MECHANISM under test is the same one that fires at production
  * thresholds on production data. */
class SkewSpec extends SparkSpec {

  // sf0.01: at sf0.001 the hot partition compresses under any sane
  // skew threshold; 60K rows make the skew physically visible.
  private val skewDir = "/root/testdata/sf0.01"

  test("AQE splits the skewed partition and preserves results") {
    var skewRows: Array[org.apache.spark.sql.Row] = null
    var plan: String = null
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1k") {
      val df = RelationalOps.skewedOrderJoin(spark, skewDir)
      skewRows = df.collect() // run → AQE finalizes the adaptive plan
      plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
    }
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"adaptive plan shows no skew split:\n$plan")
    var plainRows: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      plainRows = RelationalOps.skewedOrderJoin(spark, skewDir).collect()
    }
    assert(skewRows.nonEmpty)
    assert(skewRows.map(_.toSeq).toSeq === plainRows.map(_.toSeq).toSeq,
      "skew-split results differ from unsplit join")
  }
}
