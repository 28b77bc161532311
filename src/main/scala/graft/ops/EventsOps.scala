package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Event-stream (batch) operators over the `events` table: tumbling
  * windows, JSON extraction, exact dedup, sessionization.
  *
  * Determinism: `ts` is the ns-precision parquet column truncated to
  * microseconds identically to DuckDB's reader (Tables.events), so
  * every comparison/gap below is exact integer arithmetic on the same
  * instants. Timestamps are OUTPUT as formatted strings — parquet
  * timestamp zone semantics differ between writers, strings don't.
  *
  * Scale: all four are single-shuffle groupBy/window plans keyed on
  * user_id or (hour, type) — both high-cardinality, skew-free keys. The
  * streaming twins (true incremental state) live in
  * graft.streaming.EventsStream.
  */
object EventsOps {

  private val dec = DecimalType(18, 4)

  /** Tumbling 1-hour windows per event type (batch twin of the
    * Structured Streaming windowed agg). */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("HourTs"),
        col("event_type"))
      .agg(
        count(lit(1)).as("NEvents"),
        sum(col("value").cast(dec)).cast(DoubleType).as("TotalValue"))
      .orderBy(col("HourTs"), col("event_type"))

  /** Trailing window (days) of the rolling-actives report. */
  val ActiveWindowDays = 7

  /** ENGAGEMENT CARD — DAU / trailing-7-day WAU / stickiness per day,
    * the rolling-distinct-actives report every events pipeline ships.
    * Exact distinct over a sliding window needs no window-distinct
    * support in either engine: dedupe to USER-DAYS once, then each
    * user-day contributes to the [[ActiveWindowDays]] window-end days
    * it covers (a bounded `sequence` explode), dedupe again, count.
    * Rows are ≤ 7×|user-days| — a fixed small multiple of the already
    * day-deduped input, shuffled on uniform day keys; for long windows
    * (MAU90) where the multiplier bites, the sketch family's mergeable
    * HLL per day + window merge is the documented approximate path
    * (sketch_approx_stats demonstrates the machinery). Stickiness =
    * DAU/WAU as one IEEE divide of exact longs. Leading days carry
    * partial (warm-up) windows, the standard trailing-window
    * convention. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("Day"), col("user_id")).distinct()
    val dau = ud.groupBy(col("Day")).agg(count(lit(1)).as("DAU"))
    val wau = ud
      .select(explode(expr(
        s"sequence(Day, date_add(Day, ${ActiveWindowDays - 1}))")).as("Day"),
        col("user_id"))
      .distinct()
      .groupBy(col("Day")).agg(count(lit(1)).as("WAU"))
    dau.join(wau, "Day")
      .select(date_format(col("Day"), "yyyy-MM-dd").as("Day"),
        col("DAU"), col("WAU"),
        (col("DAU").cast(DoubleType) / col("WAU")).as("Stickiness"))
      .orderBy(col("Day"))
  }

  /** Hourly-count anomaly z-band in standard deviations (shared with
    * the mirror; the verdict is the two-sided cross-multiplied square,
    * all integer). */
  val AnomalySigmas = 2L

  /** HOURLY ANOMALY DETECTION — the operational-monitoring twin of
    * [[hourly]]: each (hour, event_type) bucket's event count checked
    * against the seasonal baseline of its HOUR-OF-DAY × type peer
    * group (the standard seasonal-naive profile), flagged when it sits
    * more than [[AnomalySigmas]]σ from the peer mean IN EITHER
    * DIRECTION (spikes and droughts both page someone).
    *
    * Fully exact: counts are integers, the baseline's (n, Σc, Σc²) are
    * integer sums, and the verdict cross-multiplies and squares —
    * `(c·n − Σc)² > σ²·(n·Σc² − (Σc)²)` — so no division, sqrt, or
    * float enters any comparison (the similarity_outliers rule on the
    * time axis). Magnitude bound: DevQ² needs (c·n)² < 2⁶³ — safe to
    * ~10⁶ events/hour against a ~1000-bucket baseline; past that,
    * promote the square to decimal128 (the similarity_outliers form).
    * Shapes: the hourly aggregate (one shuffle on a near-uniform
    * composite key), a 24×|types| baseline aggregate broadcast back. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourlyCounts = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("Hour"), col("event_type"))
      .agg(count(lit(1)).as("NEvents"))
      .withColumn("HourOfDay", hour(col("Hour")).cast(IntegerType))
    val baseline = hourlyCounts.groupBy(col("HourOfDay"), col("event_type"))
      .agg(count(lit(1)).as("BucketN"),
        sum(col("NEvents")).as("SumC"),
        sum(col("NEvents") * col("NEvents")).as("SumC2"))
    hourlyCounts.join(broadcast(baseline), Seq("HourOfDay", "event_type"))
      .withColumn("DevQ", col("NEvents") * col("BucketN") - col("SumC"))
      .withColumn("VarTerm",
        col("BucketN") * col("SumC2") - col("SumC") * col("SumC"))
      .select(
        date_format(col("Hour"), "yyyy-MM-dd HH:mm:ss").as("HourTs"),
        col("event_type"), col("NEvents"), col("HourOfDay"),
        col("BucketN"), col("DevQ"),
        (col("DevQ") * col("DevQ") >
          lit(AnomalySigmas * AnomalySigmas) * col("VarTerm")).as("IsAnomaly"))
      .orderBy(col("HourTs"), col("event_type"))
  }

  /** Histogram buckets per distribution card (shared with mirror). */
  val DistBuckets = 10

  /** VALUE DISTRIBUTION CARD — per event type, the numbers a
    * monitoring dashboard or dataset card shows for a metric column:
    * count, min/max, exact p50/p90/p99 (Spark's `percentile`
    * interpolation rule ≡ DuckDB's `quantile_cont`, hash-verified
    * corpus-wide by text_corpus_stats' precedent), an
    * order-independent mean (floor-quantized LONG sum — the
    * corpusStats playbook), and a fixed [[DistBuckets]]-bucket
    * histogram pivoted to columns.
    *
    * Bucketing is `min(B-1, floor((v−min)·B/(max−min)))` — every step
    * an exactly-rounded IEEE op on identical doubles, so bucket
    * assignment is bit-identical across engines; a degenerate type
    * (min = max) lands everything in bucket 0 via the same CASE both
    * sides. Two passes over the events scan (bounds+percentiles, then
    * bucket counts) — both partial-aggregated hash aggs on the tiny
    * type key; the histogram pivot is a conditional-sum aggregate, not
    * an Expand. */
  def valueDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("N"),
        min(col("value")).as("MinV"),
        max(col("value")).as("MaxV"),
        expr("percentile(value, 0.5)").as("P50"),
        expr("percentile(value, 0.9)").as("P90"),
        expr("percentile(value, 0.99)").as("P99"),
        (sum(floor(col("value") * 1e9).cast(LongType)).cast(DoubleType)
          / count(lit(1)) / 1e9).as("AvgValue"))
    val b = DistBuckets
    val bucketed = ev
      .join(broadcast(stats.select(col("event_type"), col("MinV"), col("MaxV"))),
        "event_type")
      .withColumn("Bkt",
        when(col("MaxV") === col("MinV"), lit(0)).otherwise(
          least(lit(b - 1),
            floor((col("value") - col("MinV")) * b / (col("MaxV") - col("MinV")))
              .cast(IntegerType))))
    val histCols = (0 until b).map(i =>
      sum(when(col("Bkt") === i, 1L).otherwise(0L)).as(s"H$i"))
    val hist = bucketed.groupBy(col("event_type")).agg(histCols.head, histCols.tail: _*)
    stats.join(hist, "event_type")
      .transform(graft.etl.Summaries.smallSort(_, col("event_type")))
  }

  /** JSON property extraction (`props` is a JSON string). Uses
    * regexp_extract rather than from_json so the exact same expression
    * is portable to the oracle; the engine also exposes
    * from_json-based parsing in the streaming module. */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1).cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("NEvents"),
        sum(col("k")).as("SumK"),
        min(col("k")).as("MinK"),
        max(col("k")).as("MaxK"))
      .transform(graft.etl.Summaries.smallSort(_, col("event_type")))

  /** Exact dedup: latest event per user (row_number = 1 over a total
    * per-user order). The canonical "keep newest version of each key"
    * pipeline op. */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("LastTs"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Funnel step window: each next step must land within this many
    * hours of the previous step's instant. 24 h discriminates at the
    * test data's per-user event density (~7 h median gap). */
  val FunnelWindowHours = 24L

  /** Time-bounded conversion funnel view → click → purchase: the
    * earliest view per user, the earliest click within
    * [[FunnelWindowHours]] AFTER that view, the earliest purchase
    * within the window after THAT click — then one row per step with
    * user counts, conversion vs step 1 (CumRate) and vs the previous
    * step (StepRate).
    *
    * All instants are exact microsecond integers (ts_ns div 1000 ==
    * DuckDB epoch_us), so the window comparisons are integer
    * arithmetic, bit-identical to the oracle.
    *
    * Scale: three filter→groupBy(user_id)→join(user_id) stages — every
    * shuffle keyed on high-cardinality user_id; each stage's right
    * side shrinks (users who reached the previous step), so later
    * joins move less data. The final window runs on THREE post-agg
    * rows (the [[graft.etl.Summaries]] post-agg-window pattern). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val winUs = FunnelWindowHours * 3600L * 1000000L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + winUs)
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t2") + winUs)
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    def step(df: DataFrame, n: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("Users"))
        .select(lit(n).as("Step"), lit(name).as("StepName"), col("Users"))
    val steps = step(v, 1, "view")
      .union(step(c, 2, "view>click"))
      .union(step(p, 3, "view>click>purchase"))
    val w = Window.orderBy(col("Step"))
    // nullif on the denominators: an empty step-1 corpus (zero 'view'
    // events) would otherwise divide by 0, where Spark double division
    // yields NULL but DuckDB (ieee_floating_point_ops) yields NaN/Inf —
    // NULL-on-zero on BOTH sides keeps oracle parity on any corpus
    steps
      .withColumn("CumRate",
        col("Users").cast(DoubleType) / nullif(first(col("Users")).over(w), lit(0L)))
      .withColumn("StepRate",
        col("Users").cast(DoubleType) / nullif(lag(col("Users"), 1).over(w), lit(0L)))
      .orderBy(col("Step"))
  }

  /** Ceiling on [[clickAttribution]]'s ESTIMATED expected pair volume
    * (the [[graft.ops.GraphOps.MaxOrderParts]] pattern applied to the
    * interval join's one quadratic risk). The join's output is
    * quadratic in per-user event DENSITY by construction — the
    * round-9 density decade (10M events on the fixture's user count)
    * measured exactly that axis — so a misconfigured deployment
    * (density-scaled corpus, or a window far wider than the arrival
    * gap) must fail LOUDLY before materializing a near-cross-product,
    * not after. 100M expected pairs ≈ several GB of shuffled pairs —
    * past any sane single-node run; a cluster deployment that truly
    * wants more raises the cap consciously via the 3-arg overload. */
  val MaxAttributionEstPairs = 100000000L

  /** Click attribution — every (view, click) pair by the same user
    * with the click inside ([[FunnelWindowHours]]] after the view,
    * aggregated per user: pair count and exact min/max/total lag in
    * integer microseconds (bit-identical to the oracle — no rate
    * doubles to drift). Unlike [[funnel]] (earliest instants only),
    * this is the full INTERVAL JOIN: an equi-join on user_id whose
    * range predicate rides along as a join residual — a hash join
    * keyed on high-cardinality user_id, NOT a theta-only
    * nested-loop. Per-user pair volume is bounded by the window, and
    * a user hot enough to matter would take the [[RelationalOps
    * .skewSaltedJoin]] treatment. The streaming twin
    * ([[graft.streaming.EventsStream.clickAttribution]]) runs the
    * same join as a watermarked stream-stream join whose range
    * condition is what lets Spark EVICT join state.
    *
    * PAIR-VOLUME GUARD: before the join runs, one linear keyed pass
    * estimates the expected output as
    * `Σ_u views_u·clicks_u · min(1, window/span)` (the uniform-arrival
    * expectation; the Σ term alone is the equi-join's worst case) and
    * refuses to execute past `maxEstPairs` — the quadratic risk fails
    * at estimate time, never at shuffle-write time. The guard pass is
    * a narrow groupBy over the events scan, trivially amortized
    * against the join it protects. */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame =
    clickAttribution(spark, dir, MaxAttributionEstPairs)

  def clickAttribution(spark: SparkSession, dir: String,
                       maxEstPairs: Long): DataFrame = {
    val winUs = FunnelWindowHours * 3600L * 1000000L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("us"))
    val guard = e.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("NV"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("NC"),
        min(col("us")).as("Mn"), max(col("us")).as("Mx"))
      .agg(sum(col("NV") * col("NC")).as("P"),
        min(col("Mn")).as("Mn"), max(col("Mx")).as("Mx"))
      .first()
    if (!guard.isNullAt(0)) {
      val worstPairs = guard.getAs[Long]("P")
      val spanUs = guard.getAs[Long]("Mx") - guard.getAs[Long]("Mn")
      val frac = if (spanUs <= 0L) 1.0 else math.min(1.0, winUs.toDouble / spanUs)
      val est = (worstPairs * frac).toLong
      require(est <= maxEstPairs,
        s"click-attribution expected pair volume ~$est (worst-case $worstPairs, " +
          s"window/span fraction $frac) exceeds $maxEstPairs — the corpus's per-user " +
          "view×click density makes the interval join near-quadratic; reduce " +
          "FunnelWindowHours, pre-filter the event types, or raise the cap explicitly")
    }
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("vus"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cuid"), col("us").as("cus"))
    v.join(c, col("user_id") === col("cuid") &&
        col("cus") > col("vus") && col("cus") <= col("vus") + winUs)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("Pairs"),
        min(col("cus") - col("vus")).as("MinLagUs"),
        max(col("cus") - col("vus")).as("MaxLagUs"),
        sum(col("cus") - col("vus")).as("SumLagUs"))
      // user-dimension output (grows with the corpus): keep the
      // presentation sort distributed per smallSort's applicability rule
      .orderBy(col("user_id"))
  }

  /** Per-session ROWS via Spark's native `session_window` — the
    * declarative sibling of [[sessionize]] (which emits per-user
    * session COUNTS from a lag/prefix-sum window): one hash aggregate
    * whose grouping key is the merging session window, no
    * user-partitioned sort window at all, and the exact same operator
    * works under Structured Streaming with a watermark (where the
    * lag-window formulation cannot run at all). Session end follows
    * Spark's definition: last event instant + gap. Oracle = the
    * gaps-and-islands decomposition (lag → new-session flag → prefix
    * sum → per-island aggregate) over exact microsecond integers, so
    * the two INDEPENDENT formulations must agree row-for-row.
    *
    * Scale: one shuffle keyed on user_id (high-cardinality, uniform);
    * within-partition session merging is Spark's own
    * UpdatingSessionsIterator — no second sort pass, state bounded by
    * one user's in-flight session. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("NEvents"),
        sum(col("value").cast(dec)).cast(DoubleType).as("ValueSum"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("StartUs"),
        unix_micros(col("session_window.end")).as("EndUs"),
        col("NEvents"), col("ValueSum"))
      // DISTRIBUTED presentation sort: sessions ≈ events on this
      // corpus (30-min gap ≪ mean inter-event gap), so the output is
      // corpus-linear — smallSort's coalesce(1) would run the final
      // session-merge aggregate in ONE task (measured 36.9 s vs ~4 s
      // at the 10M-event decade; the range sort keeps it parallel)
      .orderBy(col("user_id"), col("StartUs"))

  /** Sessionization with a 30-minute inactivity gap: lag + prefix-sum
    * of session-start flags, all in exact microsecond integers. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("NEvents"), sum(col("new_sess")).as("NSessions"))
      .orderBy(col("user_id"))
  }

  /** Paths reported by [[pathTopk]]. */
  val PathTopK = 30

  /** TOP EVENT-TYPE PATHS — the most frequent within-session
    * 3-step event-type sequences (the clickstream "common journeys"
    * report): sessionize with the same 30-minute-gap rule as
    * [[sessionize]], slide a length-3 window along each session's
    * event order, count every occurrence and the number of distinct
    * sessions containing the path, report the top [[PathTopK]] under
    * the total order (occurrences desc, then the path itself).
    *
    * Plan shape — ONE user-keyed exchange for the whole derivation:
    * the session index is a running sum of gap flags over the
    * (user_id; ts, event_id) window, and the two lookahead steps are
    * `lead` over the SAME window spec (session membership enforced by
    * comparing the led session index — `sess` is monotone along the
    * order, so `s3 = sess` implies the middle step matches too).
    * Spark plans all three window passes over one Exchange + one sort;
    * there is no per-session re-partition. Path counts then
    * hash-aggregate on uniform trigram keys (map-side partials), and
    * the top-k is TakeOrderedAndProject — the same no-global-sort
    * discipline as every other top-k in the engine.
    *
    * The running sum is pinned to ROWS UNBOUNDED PRECEDING..CURRENT
    * (not the RANGE default) so tie behavior cannot differ between
    * engines — (ts, event_id) is a total order anyway (event ids are
    * unique), the explicit frame just makes it structural. */
  def pathTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tri = Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(wr))
      .withColumn("Step2", lead(col("event_type"), 1).over(w))
      .withColumn("Step3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("sess"), 2).over(w))
      .filter(col("s3") === col("sess"))
      .select(col("event_type").as("Step1"), col("Step2"), col("Step3"),
        col("user_id"), col("sess"))
    val occ = tri.groupBy(col("Step1"), col("Step2"), col("Step3"))
      .agg(count(lit(1)).as("NOccurrences"))
    val ns = tri.distinct()
      .groupBy(col("Step1"), col("Step2"), col("Step3"))
      .agg(count(lit(1)).as("NSessions"))
    occ.join(ns, Seq("Step1", "Step2", "Step3"))
      .orderBy(col("NOccurrences").desc, col("Step1"), col("Step2"), col("Step3"))
      .limit(PathTopK)
  }

  /** MARKOV TRANSITION MATRIX over within-session event bigrams — the
    * first-order behavioral model behind [[pathTopk]]'s journeys:
    * P(next = To | current = From) as an exact integer-count ratio,
    * over the same 30-minute-gap sessionization. The |types|² matrix
    * is the trained artifact (broadcastable to any scorer); row
    * probabilities sum to 1 per From by construction.
    *
    * Same single-exchange plan as [[pathTopk]] (running-sum session
    * index + one lead over the one user-keyed window, session
    * membership by led-index equality), then a hash aggregate on the
    * (From, To) pair and a From-partition count window over the
    * matrix-sized frame (the A13 rule). Probability is ONE
    * deterministic division of exact longs. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pairs = Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(wr))
      .withColumn("To", lead(col("event_type"), 1).over(w))
      .withColumn("s2", lead(col("sess"), 1).over(w))
      .filter(col("s2") === col("sess"))
      .select(col("event_type").as("From"), col("To"))
    pairs.groupBy(col("From"), col("To"))
      .agg(count(lit(1)).as("NTransitions"))
      .withColumn("FromTotal", sum(col("NTransitions")).over(
        Window.partitionBy(col("From"))))
      .withColumn("Prob",
        col("NTransitions").cast(DoubleType) / col("FromTotal"))
      .select(col("From"), col("To"), col("NTransitions"), col("FromTotal"), col("Prob"))
      .orderBy(col("From"), col("To"))
  }
}
