package graft

import org.apache.spark.sql.DataFrame

import graft.etl.{StarQueries, Summaries, Transactions}

/** Executable plan-quality assertions — the PERFORMANCE.md checklist
  * as regression tests, so an optimizer-hostile refactor (a sort that
  * stops collapsing into top-k, a filter that stops reaching parquet,
  * a dimension join that stops broadcasting) fails CI instead of
  * silently costing 10× at scale. Asserted on the pre-AQE physical
  * plan (`sparkPlan`), which is what these properties are decided on. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  test("orderBy+limit plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Summaries.topProducts(Transactions.cleaned(spark, sfDir)))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"unexpected full sort:\n$p")
  }

  test("per-group top-n plans with WindowGroupLimit rank pushdown") {
    val p = plan(Summaries.topnPerCountry(Transactions.cleaned(spark, sfDir)))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("star join: filters reach parquet, dims broadcast, scan is pruned") {
    val p = plan(StarQueries.regionRollup(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // lineitem scan must read only the referenced columns, never the
    // full 11-column schema
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val lineitemScan = readSchemas.find(_.contains("l_orderkey"))
    assert(lineitemScan.isDefined, p)
    val nCols = lineitemScan.get.split(",").length
    assert(nCols <= 4, s"lineitem scan reads $nCols columns: ${lineitemScan.get}")
  }

  test("pivot with declared values is one aggregate pass (no discovery job)") {
    val df = graft.ops.RelationalOps.pivotCountryYear(spark, sfDir)
    val p = plan(df)
    // declared pivot values → (Country, Year) sum then Country
    // pivotfirst (2 phases each = 4 HashAggregates), ONE pass over the
    // fact stream, no Expand, and no values-discovery scan: the fact
    // input is read exactly once
    assert("HashAggregate".r.findAllIn(p).length <= 4, p)
    assert(!p.contains("Expand"), s"pivot should not Expand:\n$p")
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(scans.length == 1, s"fact stream read ${scans.length} times:\n$p")
  }

  test("grouping sets is a single Expand pass, not an N-way union") {
    val p = plan(graft.ops.RelationalOps.groupingSetsCountryYear(spark, sfDir))
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Union"), s"grouping sets planned as union:\n$p")
  }

  test("dedup clustering and curation never plan a cartesian product") {
    Seq(graft.ops.DedupOps.components(spark, sfDir),
      graft.ops.CurateOps.curate(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"quadratic join shape:\n$p")
    }
  }

  test("summaries read the shared cleaned cache, not a join replay") {
    Transactions.cleaned(spark, sfDir) // ensure the cache is registered
    val p = plan(Summaries.countrySummary(Transactions.cleaned(spark, sfDir)))
    assert(p.contains("InMemoryTableScan"), p)
    // a replay of the 5-way cleaning join would scan raw parquet; every
    // input must come from the cache (the small distinct-count joins on
    // the Country key are legitimate and read the same cache). Tree
    // traversal, not string match: InMemoryRelation's printed form
    // embeds its own build plan's FileScans, which never execute.
    val scans = Summaries.countrySummary(Transactions.cleaned(spark, sfDir))
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.isEmpty,
      s"summary rescans base tables instead of the cleaned cache: $scans")
  }
}
