package graft

import org.apache.spark.sql.functions._

import graft.ops.EventsOps
import graft.streaming.EventsStream

/** Structured Streaming twins must agree with their batch siblings. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg over events parquet matches batch totals") {
    // FileStreamSource needs a directory: stage the events file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamed = EventsStream.runHourlyOnce(spark, streamDir.toString)
    val batch = EventsOps.hourly(spark, sfDir)
    assert(streamed.agg(sum("NEvents")).head().getLong(0) === 1000L)
    assert(streamed.count() === batch.count())
    // spot-compare a few (window start, type) cells
    val sMap = streamed.collect()
      .map(r => (r.getAs[java.sql.Timestamp]("WindowStart").toString, r.getAs[String]("event_type")) -> r.getAs[Long]("NEvents")).toMap
    val bMap = batch.collect()
      .map(r => (r.getAs[String]("HourTs") + ".0", r.getAs[String]("event_type")) -> r.getAs[Long]("NEvents")).toMap
    assert(sMap === bMap)
  }

  test("append mode emits only watermark-finalized windows, matching batch values") {
    import org.apache.spark.sql.streaming.OutputMode
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_append")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.hourlyCounts(EventsStream.readEventsStream(spark, streamDir.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("events_hourly_append")
      .start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("events_hourly_append").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("WindowStart").toString,
        r.getAs[String]("event_type")) -> r.getAs[Long]("NEvents")).toMap
    val batch = graft.ops.EventsOps.hourly(spark, sfDir).collect()
      .map(r => (r.getAs[String]("HourTs") + ".0", r.getAs[String]("event_type")) ->
        r.getAs[Long]("NEvents")).toMap
    // only FINALIZED windows (older than the 30-min watermark) may be
    // emitted in Append mode — so a strict, value-identical subset:
    // the tail of the stream is withheld as live state
    assert(emitted.nonEmpty, "append emitted nothing — watermark never advanced")
    assert(emitted.size < batch.size,
      "append emitted every window — nothing was withheld as live state")
    emitted.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"window $k: append=$n batch=${batch.get(k)}")
    }
  }

  test("flatMapGroupsWithState as-of view matches batch events_asof_view") {
    import spark.implicits._
    implicit val s = spark
    val events = graft.etl.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val streamed = EventsStream.purchaseAsof(events).collect()
      .map(p => (p.user_id, p.event_id) -> ((p.purchaseUs, p.lastViewUs))).toMap
    val batch = graft.ops.RelationalOps.purchaseAsofView(spark, sfDir).collect()
      .map { r =>
        val gap = if (r.isNullAt(r.fieldIndex("GapMicros"))) None
                  else Some(r.getAs[Long]("GapMicros"))
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          ((r.getAs[String]("PurchaseTs"), gap))
      }.toMap
    assert(streamed.keySet === batch.keySet)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    streamed.foreach { case (k, (purchaseUs, lastViewUs)) =>
      val (expTs, expGap) = batch(k)
      assert(fmt.format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(purchaseUs, 1000000L))) === expTs, s"ts mismatch at $k")
      assert(lastViewUs.map(purchaseUs - _) === expGap, s"gap mismatch at $k")
    }
  }

  test("streaming upsert into a JDBC warehouse via foreachBatch equals batch dedup") {
    import org.apache.spark.sql.functions._
    implicit val s = spark
    import spark.implicits._
    // stream events → running latest-per-user state → per-microbatch
    // JDBC overwrite through the SAME writeJdbc path as the batch
    // sinks: the standard streaming-compaction-to-warehouse topology
    // (at scale: MERGE/upsert per batch instead of overwrite).
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_jdbc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_stream").toString
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val events = EventsStream.readEventsStream(spark, streamDir.toString)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val q = EventsStream.latestPerUser(events)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventsStream.LatestEvent], _: Long) =>
        graft.etl.Load.writeJdbc(
          Map("latest_events" -> batch.toDF()), url, props)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val fromDb = spark.read.jdbc(url, "latest_events", props).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("lastus"), r.getAs[String]("event_type")))).toMap
    val batchTwin = graft.ops.EventsOps.dedupLatest(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type")).toMap
    assert(fromDb.nonEmpty)
    assert(fromDb.keySet === batchTwin.keySet)
    fromDb.foreach { case (u, (_, t)) => assert(batchTwin(u) === t, s"user $u") }
  }

  test("mapGroupsWithState latest-per-user matches batch events_dedup_latest") {
    import spark.implicits._
    implicit val s = spark
    val events = graft.etl.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val streamed = EventsStream.latestPerUser(events).collect()
      .map(l => l.user_id -> ((fmt.format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.lastUs, 1000000L))), l.event_type, l.value))).toMap
    val batch = EventsOps.dedupLatest(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[String]("LastTs"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))).toMap
    assert(streamed === batch)
  }

  test("mapGroupsWithState sessionization matches batch sessionize") {
    import spark.implicits._
    implicit val s = spark
    val events = graft.etl.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val stateful = EventsStream.sessionCounts(events).collect()
      .map(u => u.user_id -> ((u.nEvents, u.nSessions))).toMap
    val batch = EventsOps.sessionize(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("NEvents"), r.getAs[Long]("NSessions")))).toMap
    assert(stateful === batch)
  }
}
