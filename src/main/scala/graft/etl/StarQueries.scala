package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Star-schema join queries. The reference itself contains zero joins
  * (SURVEY.md §2.6) — every summary re-aggregates one table — but a
  * complete engine over this substrate needs the join family, so these
  * are first-class named queries.
  *
  * Scale notes: dimension joins (nation, region) are explicit
  * `broadcast()` — a few KB replicated to every executor, no shuffle.
  * The orders⋈lineitem fact join shuffles both sides on orderkey;
  * customer is left to Catalyst/AQE, which broadcasts it while it fits
  * and falls back to shuffle join beyond `autoBroadcastJoinThreshold`.
  * Semi/anti joins use Spark's dedicated left_semi/left_anti plans —
  * they never materialize the probe side's payload columns.
  */
object StarQueries {

  private val dec = DecimalType(18, 4)

  private def revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)

  /** Revenue rollup by region: lineitem⋈orders⋈customer⋈nation⋈region,
    * non-cancelled (o_orderstatus <> 'F') only. */
  def regionRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("Region"))
      .agg(
        sum(revenue).cast(DoubleType).as("TotalRevenue"),
        countDistinct(o("o_orderkey")).as("TotalOrders"),
        countDistinct(c("c_custkey")).as("TotalCustomers"))
      .transform(Summaries.smallSort(_, col("Region")))
  }

  /** Revenue rollup by market segment — the fact-fact join exercised
    * with a customer-side attribute. */
  def mktsegmentRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    val c = Tables.customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_mktsegment").as("Segment"))
      .agg(
        sum(revenue).cast(DoubleType).as("TotalRevenue"),
        countDistinct(o("o_orderkey")).as("TotalOrders"),
        countDistinct(c("c_custkey")).as("TotalCustomers"),
        sum(col("l_quantity").cast(LongType)).as("TotalItems"))
      .transform(Summaries.smallSort(_, col("Segment")))
  }

  /** Customers having ≥1 cancelled ('F') order — left_semi (EXISTS). */
  def cancelledCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Parts that never shipped — left_anti (NOT EXISTS). */
  def unsoldParts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }
}
