package graft.tools


/** Dev probe: why does/doesn't OptimizeSkewedJoin fire on the skew
  * demo join (round-3 investigation). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(defaultCpus = 4, extraConfs = Seq(
      // force the SMJ + tiny AQE thresholds so the skew split fires
      // on gate-scale data
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1k"))
    spark.sparkContext.setLogLevel("INFO")
    val df = graft.ops.RelationalOps.skewedOrderJoin(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    println("[skewprobe] final plan:\n" + plan)
    spark.stop()
  }
}
