package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.etl.Tables

/** Bucketing — the co-located-join technique the 100 TB design notes
  * name: writing both fact tables bucketed (and sorted) on the join
  * key lets a later sort-merge join read bucket-for-bucket with NO
  * shuffle exchange and NO re-sort on either side. At scale this is
  * the difference between a join that moves 100 TB over the network
  * every run and one that moves nothing — the shuffle is paid ONCE at
  * write time and amortized over every subsequent join. */
class BucketSpec extends SparkSpec {

  test("bucketed+sorted tables join with no shuffle and no sort") {
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("NRows"), sum(col("l_quantity")).as("SumQty"))
      val smj = bucketed.queryExecution.sparkPlan.collectFirst {
        case j: SortMergeJoinExec => j
      }
      assert(smj.isDefined, bucketed.queryExecution.sparkPlan.toString)
      val exchanges = smj.get.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n${smj.get}")
      val sorts = smj.get.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.isEmpty,
        s"bucketed+sorted join still re-sorts:\n${smj.get}")
      // values identical to the plain (shuffling) join
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("NRows"), sum(col("l_quantity")).as("SumQty"))
      assert(bucketed.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq ===
        plain.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      old match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
