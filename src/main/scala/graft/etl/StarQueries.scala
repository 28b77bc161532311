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
  /** Fact side pre-aggregated to PER-ORDER partials before the star
    * joins (r18, guide §2.3 aggregate-before-shuffle): the two
    * `countDistinct`s over the raw joined fact rows planned as an
    * Expand ×3 — every fact row tripled into the grouping exchange.
    * Per-order revenue partials make the order count a PLAIN count
    * (the l_orderkey group is unique, the orders join 1:1), so only
    * c_custkey still needs a distinct, and every post-join operator
    * runs at order granularity (~¼ the fact rows, and the partial
    * aggregate shares its exchange key with the orderkey join).
    * Semantics are bit-identical: the per-order decimal sums
    * re-aggregate exactly (same decSum discipline as
    * AggMaintenance.partials), count(o_orderkey) over 1:1-joined
    * unique keys ≡ countDistinct over the fact join, and the distinct
    * custkey set is unchanged (inner join keeps exactly the orders
    * having lineitems either way). */
  def regionRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(revenue).as("OrderRev"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("Region"))
      .agg(
        sum(col("OrderRev")).cast(DoubleType).as("TotalRevenue"),
        count(o("o_orderkey")).as("TotalOrders"),
        countDistinct(c("c_custkey")).as("TotalCustomers"))
      .transform(Summaries.isolatedSmallSort(_, col("Region")))
  }

  /** Revenue rollup by market segment — the fact-fact join exercised
    * with a customer-side attribute. Same per-order pre-aggregation
    * as [[regionRollup]] (r18): the quantity sum rides the same
    * partials (long sums re-aggregate exactly), so every declared
    * column is decomposable or 1:1 and the results hash-match. */
  def mktsegmentRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    val c = Tables.customer(spark, dir)
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(revenue).as("OrderRev"),
        sum(col("l_quantity").cast(LongType)).as("OrderItems"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_mktsegment").as("Segment"))
      .agg(
        sum(col("OrderRev")).cast(DoubleType).as("TotalRevenue"),
        count(o("o_orderkey")).as("TotalOrders"),
        countDistinct(c("c_custkey")).as("TotalCustomers"),
        sum(col("OrderItems")).as("TotalItems"))
      .transform(Summaries.isolatedSmallSort(_, col("Segment")))
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
