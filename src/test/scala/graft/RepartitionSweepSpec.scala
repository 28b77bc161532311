package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, RepartitionByExpression}

/** Engine-wide enforcement of the round-15 shuffle-granularity rule
  * (r15 verdict #7): the full-20M edge run proved that an exchange
  * sized by candidate OUTPUT volume alone can split a small shuffled
  * row set across tens of thousands of reducers — ~1 row per
  * (map, reduce) slice, and a shuffle slice is a compression frame,
  * so the shuffle wrote as incompressible one-row frames under ANY
  * codec (disk today, network frames on a cluster).
  * `SimilarityOps.candidatePartitions` now carries the input-rows
  * bound, and PlanSpec asserts it for the similarity joins — but any
  * FUTURE fan-out site (a banded LSH pair explosion, a new routed
  * join) could re-create the defect with a hand-pinned width.
  *
  * This sweep makes the class unwritable engine-wide: every pinned
  * repartition (`REPARTITION_BY_NUM` / round-robin with an explicit
  * width) in every gate query's optimized plan must keep its width at
  * or below max(session floor, ceil(shuffledRows /
  * MinShuffleRowsPerTask)) — i.e. a pinned exchange may go wide only
  * when its own input rows sustain ≥ MinShuffleRowsPerTask rows per
  * reduce slice; up to the session floor is always allowed (that is
  * the width AQE would plan anyway, and the pinned spreads
  * deliberately sit AT or BELOW it on small corpora). Widths are
  * checked against the exchange's OWN shuffled input, counted by
  * executing the repartition node's child.
  *
  * The `_stream` twins are excluded: building them runs a streaming
  * query (side effects, minutes of wall), and their plan shapes are
  * the batch twins' — every pinned repartition they contain is swept
  * through the batch query that shares the substrate. */
class RepartitionSweepSpec extends SparkSpec {

  test("every pinned repartition width in the gate plans respects the input-granularity bound") {
    val session = spark.sessionState.conf.numShufflePartitions
    val minRows = graft.ops.SimilarityOps.MinShuffleRowsPerTask
    // child row counts memoized by canonicalized plan — the gate
    // queries share substrates, so most pinned nodes repeat
    val rowsMemo = scala.collection.mutable.HashMap.empty[LogicalPlan, Long]
    def rowsOf(child: LogicalPlan): Long =
      rowsMemo.getOrElseUpdate(child.canonicalized,
        spark.sessionState.executePlan(child).toRdd.count())
    val batchQueries = SparkEntry.queries.filterNot(_._1.endsWith("_stream"))
    assert(batchQueries.size >= 150, s"sweep lost the gate: ${batchQueries.size}")
    var checked = 0
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    batchQueries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan = q(spark, sfDir).queryExecution.optimizedPlan
      val pinned = plan.collect {
        case r: RepartitionByExpression if r.optNumPartitions.isDefined =>
          (r.optNumPartitions.get, r.child)
        case r: Repartition if r.shuffle => (r.numPartitions, r.child)
      }
      pinned.foreach { case (width, child) =>
        checked += 1
        if (width > session) {
          // only widths past the session floor can fragment — and
          // only they need the (potentially expensive) input count
          val rows = rowsOf(child)
          val bound = math.max(session.toLong,
            (rows + minRows - 1L) / minRows)
          if (width > bound)
            violations += s"$name: pinned width $width > bound $bound " +
              s"(input rows $rows, session floor $session) — one-row " +
              s"shuffle frames at scale; size via candidatePartitions " +
              s"with inputRows"
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
    // non-vacuous: the engine's pinned spreads and sized exchanges
    // must actually appear in the swept plans
    assert(checked >= 10,
      s"swept only $checked pinned exchanges — collection broke?")
  }
}
