package graft

import org.apache.spark.sql.functions._

/** Runtime semi-join reduction: when a selective predicate sits on one
  * side of a shuffle join, Spark can inject a Bloom-filter runtime
  * filter — `bloom_filter_agg` over the selective side's join keys,
  * `might_contain` pushed into the other side's scan — so the fact
  * stream drops non-matching rows BEFORE the shuffle. At 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction whenever the filtered side is too
  * big to broadcast. Thresholds are lowered so the tiny test corpus
  * qualifies — the MECHANISM is the same one that fires at production
  * thresholds on production data (same rationale as SkewSpec). */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def urgentJoin() = {
    val orders = graft.etl.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.etl.Tables.lineitem(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("a selective join side injects a Bloom runtime filter on the fact scan, values unchanged") {
    var filtered: Array[org.apache.spark.sql.Row] = null
    var optimized: String = null
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // broadcast off: the runtime filter is the only reduction
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB") {
      val df = urgentJoin()
      optimized = df.queryExecution.optimizedPlan.toString
      filtered = df.collect()
    }
    assert(optimized.contains("bloom_filter_agg"),
      s"no bloom filter built over the selective side:\n$optimized")
    assert(optimized.contains("might_contain"),
      s"no might_contain probe on the fact side:\n$optimized")
    var plain: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      plain = urgentJoin().collect()
    }
    assert(filtered.nonEmpty)
    assert(filtered.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq,
      "runtime-filtered join results differ from the plain join")
  }
}
