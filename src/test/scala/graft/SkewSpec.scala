package graft

import graft.ops.RelationalOps

/** Skew hardening: AQE's OptimizeSkewedJoin must split the hot
  * partition of a deliberately skewed join (one key = ~50% of the fact
  * rows) and produce values identical to the unsplit join. Thresholds
  * are lowered to make the tiny test corpus register as skewed — the
  * MECHANISM under test is the same one that fires at production
  * thresholds on production data. */
class SkewSpec extends SparkSpec {

  test("hot LSH band buckets are excluded from blocking; the real corpus never hits the cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted frame: one normal bucket (4 docs → 6 pairs) and one
    // boilerplate bucket whose occupancy blows past the cap — the k²
    // candidate blowup the cap exists to prevent
    val hotK = graft.ops.DedupOps.HotBandMaxOccupancy + 50
    val exploded = (
      (1L to 4L).map(i => (i, 1, "nx")) ++
        (1000L until (1000L + hotK)).map(i => (i, 2, "HOT"))
      ).toDF("doc_id", "band_id", "band_val")
    val pairs = graft.ops.DedupOps.candidatePairsFrom(exploded)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounded candidate volume: the hot bucket contributes NOTHING
    // (k(k-1)/2 would be ~47k pairs); the normal bucket is untouched
    assert(pairs.length === 6, s"got ${pairs.length} candidates")
    assert(pairs.forall { case (a, b) => a < 1000L && b < 1000L })
    assert(pairs.toSet === (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet)

    // a bucket AT the cap still blocks (boundary inclusive)
    val atCap = (1L to graft.ops.DedupOps.HotBandMaxOccupancy.toLong)
      .map(i => (i, 1, "edge")).toDF("doc_id", "band_id", "band_val")
    val n = graft.ops.DedupOps.HotBandMaxOccupancy.toLong
    assert(graft.ops.DedupOps.candidatePairsFrom(atCap).count() === n * (n - 1) / 2)

    // premise that keeps the production corpus' verified pairs
    // unchanged: its max band occupancy sits far below the cap
    val bands = graft.ops.DedupOps.minhashBands(spark, sfDir)
    val maxOcc = (1 to 4).map { b =>
      bands.groupBy(col(s"B$b")).count()
        .agg(max(col("count"))).head().getLong(0)
    }.max
    assert(maxOcc <= graft.ops.DedupOps.HotBandMaxOccupancy / 4,
      s"corpus max band occupancy $maxOcc is within 4x of the cap — re-tune HotBandMaxOccupancy")
  }

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
