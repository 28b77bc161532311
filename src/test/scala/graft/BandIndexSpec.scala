package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.ops.DedupOps

/** The persisted corpus band index: written once `bucketBy(band_id,
  * band_val)`, probed by every ingest batch. The write-once half of
  * ingestion-time dedup — at 100 TB the corpus side must never
  * re-shuffle per batch, only the (small) arriving batch moves. */
class BandIndexSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("incremental dedup probes the bucketed index with NO exchange on the corpus side") {
    DedupOps.bandIndexTable(spark, sfDir) // build-if-absent
    // AQE off: exchanges are inserted by EnsureRequirements, which only
    // runs for the executed plan — the pre-AQE static plan shows none
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plan = DedupOps.incremental(spark, sfDir).queryExecution.executedPlan
      val bandJoin = plan.collectFirst {
        case j: SortMergeJoinExec if j.leftKeys.exists(_.toString.contains("band_val")) => j
      }
      assert(bandJoin.isDefined, s"no sort-merge band join found:\n$plan")
      def bucketScans(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case e: ShuffleExchangeExec => e }
      val (corpusSide, batchSide) =
        if (bucketScans(bandJoin.get.left).nonEmpty) (bandJoin.get.left, bandJoin.get.right)
        else (bandJoin.get.right, bandJoin.get.left)
      assert(bucketScans(corpusSide).nonEmpty,
        s"neither join side reads the bucketed index:\n$plan")
      assert(shuffles(corpusSide).isEmpty,
        s"corpus side re-shuffles despite the bucketed layout:\n$corpusSide")
      assert(shuffles(batchSide).nonEmpty,
        s"expected the arriving batch to shuffle into the bucket layout:\n$batchSide")
    }
  }

  test("invalidateSketches drops the persisted index; the next query rebuilds it") {
    val name = DedupOps.bandIndexTable(spark, sfDir)
    assert(spark.catalog.tableExists(name))
    DedupOps.invalidateSketches(spark)
    // stale index against a refreshed corpus = silently wrong matches;
    // it must go with the session caches
    assert(!spark.catalog.tableExists(name), "stale band index survived invalidation")
    val rows = DedupOps.incremental(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(spark.catalog.tableExists(name), "query did not rebuild the index")
  }
}
