package graft

import org.apache.spark.sql.functions._

import graft.ops.EventsOps
import graft.streaming.EventsStream

/** Structured Streaming twins must agree with their batch siblings. */
class StreamingSpec extends SparkSpec {

  /** Write `df` as ONE parquet part file at `dst` — FileStreamSource
    * staging shared by the restart/sentinel tests; `mtimeMs` pins the
    * file's modification time (the source orders batches by it). */
  private def stagePart(df: org.apache.spark.sql.DataFrame,
                        dst: java.nio.file.Path,
                        mtimeMs: Option[Long] = None): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_stage_part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    try Files.copy(listing.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get, dst)
    finally listing.close()
    mtimeMs.foreach(ms => Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(ms)))
  }

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

  test("checkpointed file-sink query restarted mid-stream: resumed run equals uninterrupted run, no duplicate/lost windows") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.OutputMode
    import scala.jdk.CollectionConverters._
    val raw = graft.etl.Tables.eventsRaw(spark, sfDir)
    // split arrivals at the median event time: half1 lands before the
    // stop, half2 after the restart, so the hour containing the cut has
    // rows on BOTH sides — its final count is only correct if the
    // aggregation state survived the restart
    val cutNs = raw.selectExpr("CAST(percentile_approx(ts, 0.5) AS BIGINT)").first().getLong(0)
    def stage(df: org.apache.spark.sql.DataFrame, dir: java.nio.file.Path, name: String): Unit =
      stagePart(df, dir.resolve(name))
    def runToCompletion(streamDir: String, outDir: String, ckDir: String): Unit = {
      val q = EventsStream.hourlyCounts(EventsStream.readEventsStream(spark, streamDir))
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckDir)
        .start(outDir) // parquet file sink (the default format)
      q.processAllAvailable()
      q.stop()
    }
    // key windows by RAW MICROSECONDS, not rendered strings:
    // java.sql.Timestamp.toString renders in the JVM default timezone,
    // so a string key would shift the finalizedBy cutoff by the local
    // offset on a non-UTC JVM (spuriously failing — or silently
    // weakening — the completeness check below)
    def readOut(outDir: String): Map[(Long, String), (Long, Double)] =
      (try spark.read.parquet(outDir)
        .withColumn("WUs", org.apache.spark.sql.functions
          .unix_micros(col("WindowStart"))).collect()
      catch { case _: Throwable => Array.empty[org.apache.spark.sql.Row] })
        .map(r => (r.getAs[Long]("WUs"), r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("NEvents"), r.getAs[Double]("TotalValue")))).toMap

    // interrupted run: half1 → stop → half2 → restart from checkpoint
    val streamDir = Files.createTempDirectory("graft_restart_in")
    val outDir = Files.createTempDirectory("graft_restart_out").toString
    val ckDir = Files.createTempDirectory("graft_restart_ck").toString
    stage(raw.filter(col("ts") <= cutNs), streamDir, "half1.parquet")
    runToCompletion(streamDir.toString, outDir, ckDir)
    val afterPhase1 = readOut(outDir)
    stage(raw.filter(col("ts") > cutNs), streamDir, "half2.parquet")
    runToCompletion(streamDir.toString, outDir, ckDir)
    val resumed = readOut(outDir)

    // control: the same data, same query, never interrupted
    val streamDir2 = Files.createTempDirectory("graft_restart_in2")
    val outDir2 = Files.createTempDirectory("graft_restart_out2").toString
    stage(raw, streamDir2, "all.parquet")
    runToCompletion(streamDir2.toString, outDir2,
      Files.createTempDirectory("graft_restart_ck2").toString)
    val uninterrupted = readOut(outDir2)

    // the restart finalized MORE windows (it did resume, not replay-nothing)
    assert(afterPhase1.nonEmpty && resumed.size > afterPhase1.size)
    // no duplicates: the file sink's _spark_metadata must commit each
    // finalized window exactly once across the two process incarnations
    val dupCheck = spark.read.parquet(outDir)
      .groupBy(col("WindowStart"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(dupCheck === 0L, "a window was emitted twice across the restart")
    // no lost/extra: resumed == uninterrupted, keys AND values
    assert(resumed === uninterrupted)
    // state survival: the cut-straddling hour aggregated rows from both
    // incarnations; its value must match the batch query over all data.
    // The batch side's HourTs strings were rendered by Spark under the
    // session's UTC timezone, so parsing them with an explicit UTC
    // formatter recovers the exact window-start instant
    val cutHourUs = cutNs / 1000000000L / 3600L * 3600L * 1000000L
    val hourFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    def hourTsToUs(s: String): Long = java.time.LocalDateTime
      .parse(s, hourFmt).toInstant(java.time.ZoneOffset.UTC)
      .getEpochSecond * 1000000L
    val batch = EventsOps.hourly(spark, sfDir).collect()
      .map(r => (hourTsToUs(r.getAs[String]("HourTs")), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("NEvents"), r.getAs[Double]("TotalValue")))).toMap
    val straddling = resumed.filter(_._1._1 == cutHourUs)
    assert(straddling.nonEmpty, s"cut hour $cutHourUs was not finalized — split landed too late in the stream")
    straddling.foreach { case (k, v) =>
      assert(batch(k) === v, s"cut-straddling window $k lost pre-restart state")
    }
    // full batch-oracle equivalence over the finalized domain (the
    // gate query's hash bar, applied across the restart): EVERY
    // emitted window must carry exactly the batch value, and every
    // batch window watermark-finalized by the last arrival (window
    // end ≤ max ts − 30 min) must have been emitted — restart
    // equivalence as "nothing wrong AND nothing missing", not just
    // the one straddling hour
    resumed.foreach { case (k, v) =>
      assert(batch(k) === v, s"window $k diverged from the batch oracle across the restart")
    }
    val maxUs = raw.selectExpr("CAST(max(ts) AS BIGINT)").first().getLong(0) / 1000L
    val finalizedBy = maxUs - 30L * 60L * 1000000L
    val mustHave = batch.keySet.filter { case (wus, _) =>
      wus + 3600L * 1000000L <= finalizedBy
    }
    val missing = mustHave -- resumed.keySet
    assert(missing.isEmpty, s"watermark-finalized windows lost across the restart: $missing")
  }

  test("dropDuplicatesWithinWatermark: twice-delivered stream dedups to the single-copy batch table") {
    import org.apache.spark.sql.streaming.OutputMode
    // stage the SAME events file twice — a full at-least-once
    // re-delivery of every record
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    Seq("events_a.parquet", "events_b.parquet").foreach { name =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        streamDir.resolve(name))
    }
    val q = EventsStream.dedupEvents(EventsStream.readEventsStream(spark, streamDir.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("events_dedup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("events_dedup_stream")
    val batch = graft.etl.Tables.events(spark, sfDir)
    assert(streamed.count() === batch.count(),
      "duplicate deliveries leaked into (or rows vanished from) the sink")
    // exact row-level equality with the batch table, not just counts
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[String]("event_type"), r.getAs[Double]("value"))).toSet
    assert(rows(streamed) === rows(batch))
  }

  test("foreachBatch decontamination over a two-file doc stream matches batch curate_decontaminate") {
    import graft.streaming.DocsStream
    // documents arrive as a two-microbatch stream; the eval shingle
    // set stays static across both (foreachBatch kernel — a plain
    // streaming groupBy would pin one state row per doc forever)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_docs")
    graft.etl.Tables.documents(spark, sfDir)
      .repartition(2).write.mode("overwrite").parquet(s"$streamDir/docs")
    val evalSh = graft.ops.CurateOps.evalShingles(spark, sfDir)
    val buf = collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    val stream = spark.readStream.schema(graft.etl.Tables.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/docs")
    val q = DocsStream.runDecontaminate(spark, stream, evalSh) { out =>
      val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("NEvalDocs"), r.getAs[Int]("NSharedShingles")))
      buf.synchronized { buf ++= rows }
    }
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")
    assert(buf.size === buf.map(_._1).toSet.size, "a doc was emitted twice")
    val streamed = buf.map { case (id, ne, ns) => id -> ((ne, ns)) }.toMap
    val batch = graft.ops.CurateOps.decontaminate(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("NEvalDocs"), r.getAs[Int]("NSharedShingles"),
          r.getAs[Boolean]("IsContaminated")))).toMap
    // the stream emits exactly the contaminated train docs (inner join);
    // the batch zero-fills the clean ones
    assert(streamed.keySet === batch.collect { case (id, (_, _, true)) => id }.toSet)
    assert(streamed.nonEmpty, "no contaminated docs — the equivalence is vacuous")
    streamed.foreach { case (id, (ne, ns)) =>
      assert(batch(id)._1 === ne, s"doc $id NEvalDocs: stream=$ne batch=${batch(id)._1}")
      assert(batch(id)._2 === ns, s"doc $id NSharedShingles: stream=$ns batch=${batch(id)._2}")
    }
  }

  test("foreachBatch decontamination at n=3 (raw string shingle keys) matches batch decontaminate end-to-end") {
    import graft.streaming.DocsStream
    // the round-13 advice bug was SPECIFICALLY n = 3: the shared
    // 3-gram substrate keeps raw STRING shingle keys where wide
    // windows carry xxhash64 int64 — a consumer hand-rolling the hash
    // would join bigint against string and silently match nothing.
    // shingleKeysSql makes that unwritable; this drives the n = 3 key
    // type through the WHOLE streaming twin (runDecontaminate →
    // decontaminateBatch → join against evalShingles(n = 3)) on a
    // PLANTED corpus where every doc shares one 3-gram — train-test
    // overlap exists whatever splitOf assigns, so a silently-empty
    // join cannot pass
    val dir = java.nio.file.Files.createTempDirectory("graft_n3_docs")
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val text = s"alpha beta gamma tok$i fill${i % 7} end$i"
      (i, text, "en", s"s${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    docs.repartition(2).write.parquet(s"$dir/stream")
    val evalSh3 = graft.ops.CurateOps.evalShingles(spark, dir.toString, n = 3)
    val buf = collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    val stream = spark.readStream.schema(graft.etl.Tables.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/stream")
    val q = DocsStream.runDecontaminate(spark, stream, evalSh3, n = 3) { out =>
      val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("NEvalDocs"), r.getAs[Int]("NSharedShingles")))
      buf.synchronized { buf ++= rows }
    }
    q.processAllAvailable()
    q.stop()
    assert(buf.size === buf.map(_._1).toSet.size, "a doc was emitted twice")
    val streamed = buf.map { case (id, ne, ns) => id -> ((ne, ns)) }.toMap
    val batch = graft.ops.CurateOps.decontaminate(spark, dir.toString, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("NEvalDocs"), r.getAs[Int]("NSharedShingles"),
          r.getAs[Boolean]("IsContaminated")))).toMap
    assert(streamed.keySet === batch.collect { case (id, (_, _, true)) => id }.toSet)
    // the planted 3-gram guarantees contamination: every train doc
    // shares "alpha beta gamma" with every test doc — a zero-hit run
    // (the silent bigint-vs-string class) fails HERE, not vacuously
    assert(streamed.nonEmpty && streamed.keySet === batch.keySet,
      "every planted train doc must flag contaminated at n = 3")
    streamed.foreach { case (id, (ne, ns)) =>
      assert(batch(id)._1 === ne, s"doc $id NEvalDocs: stream=$ne batch=${batch(id)._1}")
      assert(batch(id)._2 === ns, s"doc $id NSharedShingles: stream=$ns batch=${batch(id)._2}")
    }
  }

  test("foreachBatch incremental dedup over a two-file doc stream equals batch dedup_incremental") {
    import graft.ops.DedupOps
    import graft.streaming.DocsStream
    // the new-arrival docs land as TWO files = two microbatches; the
    // corpus band index stays static across both
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_incdedup")
    graft.etl.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % DedupOps.NewArrivalMod === DedupOps.NewArrivalRemainder)
      .repartition(2).write.mode("overwrite").parquet(s"$streamDir/docs")
    val corpus = DedupOps.corpusBandIndex(spark, sfDir)
    val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = spark.readStream.schema(graft.etl.Tables.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/docs")
    val q = DocsStream.runIncrementalDedup(spark, stream, corpus) { out =>
      val rows = out.collect().map(r => (r.getAs[Long]("NewId"),
        r.getAs[Long]("CorpusId"), r.getAs[Double]("Jaccard")))
      buf.synchronized { buf ++= rows }
    }
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")
    val batch = DedupOps.incremental(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("NewId"), r.getAs[Long]("CorpusId"),
        r.getAs[Double]("Jaccard"))).toSet
    assert(buf.nonEmpty && buf.size === buf.toSet.size, "duplicate emissions across batches")
    assert(buf.toSet === batch)
  }

  test("foreachBatch incremental vec dedup over a two-file stream equals batch similarity_incremental_dedup") {
    import graft.ops.SimilarityOps
    import graft.streaming.VecsStream
    // the new-arrival vectors land as TWO files = two microbatches; the
    // persisted IVF index (codebook + corpus lists) stays static
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_vecdedup")
    val isNew = col("vec_id") % SimilarityOps.NewVecMod === SimilarityOps.NewVecRemainder
    graft.etl.Tables.embeddings(spark, sfDir)
      .filter(isNew)
      .repartition(2).write.mode("overwrite").parquet(s"$streamDir/vecs")
    val base = SimilarityOps.ivfIndexPath(spark, sfDir)
    val cent = spark.read.parquet(s"$base/codebook")
    val corpusLists = spark.read.parquet(s"$base/lists").filter(!isNew)
    val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = spark.readStream.schema(graft.etl.Tables.embeddingsSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/vecs")
    val q = VecsStream.runIncrementalDedup(stream, cent, corpusLists) { out =>
      val rows = out.collect().map(r => (r.getAs[Long]("NewId"),
        r.getAs[Long]("CorpusId"), r.getAs[Double]("Cosine")))
      buf.synchronized { buf ++= rows }
    }
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")
    val batch = SimilarityOps.incrementalDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("NewId"), r.getAs[Long]("CorpusId"),
        r.getAs[Double]("Cosine"))).toSet
    assert(buf.nonEmpty && buf.size === buf.toSet.size, "duplicate emissions across batches")
    assert(buf.toSet === batch)
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

  test("streaming ivfAppend over a two-file vector stream equals one batch append") {
    import graft.ops.SimilarityOps
    import java.nio.file.Files
    // two corpora with the same 400-vector base; A is maintained by the
    // STREAM (arrivals as two microbatches), B by one batch ivfAppend
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def mkCorpus(): String = {
      val d = Files.createTempDirectory("graft_stream_ivfapp").toAbsolutePath
      all.filter(col("vec_id") < 400).coalesce(1)
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      SimilarityOps.buildIvfIndex(spark, d.toString)
      d.toString
    }
    val (dirA, dirB) = (mkCorpus(), mkCorpus())
    val arrivals = all.filter(col("vec_id") >= 400).select(col("vec_id"), col("embedding"))

    val streamSrc = Files.createTempDirectory("graft_stream_ivfsrc")
    arrivals.repartition(2).write.mode("overwrite").parquet(s"$streamSrc/vecs")
    val routedBatches = collection.mutable.ArrayBuffer.empty[Array[Long]]
    val q = graft.streaming.VecsStream.runIndexAppend(dirA,
        spark.readStream.schema(graft.etl.Tables.embeddingsSchema)
          .option("maxFilesPerTrigger", "1").parquet(s"$streamSrc/vecs")) { r =>
      routedBatches.synchronized { routedBatches += r }
    }
    q.processAllAvailable()
    q.stop()
    assert(routedBatches.size >= 2, "expected at least two appended microbatches")

    SimilarityOps.ivfAppend(spark, dirB, arrivals)

    // both indexes hold the identical 500 rows and answer probes the same
    val baseA = SimilarityOps.ivfIndexPath(spark, dirA)
    val baseB = SimilarityOps.ivfIndexPath(spark, dirB)
    assert(spark.read.parquet(s"$baseA/lists").count() === 500L)
    def rows(b: String) = spark.read.parquet(s"$b/lists")
      .select("vec_id", "Cid").collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    assert(rows(baseA) === rows(baseB))
    val a = SimilarityOps.ivfTopk(spark, dirA).collect().toSeq
    val b = SimilarityOps.ivfTopk(spark, dirB).collect().toSeq
    assert(a == b, "stream-maintained index answers differently from batch-maintained")
  }

  test("streaming bandAppend over a two-file doc stream equals one batch append") {
    import graft.ops.{BucketedTables, DedupOps}
    import java.nio.file.Files
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    def mkCorpus(): String = {
      val d = Files.createTempDirectory("graft_stream_bandapp").toAbsolutePath
      all.filter(col("doc_id") < 400).coalesce(1)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      DedupOps.bandIndexTable(spark, d.toString)
      d.toString
    }
    val (dirA, dirB) = (mkCorpus(), mkCorpus())
    val newDocs = all.filter(col("doc_id") >= 400 &&
      !(col("doc_id") % DedupOps.NewArrivalMod === DedupOps.NewArrivalRemainder))

    val streamSrc = Files.createTempDirectory("graft_stream_bandsrc")
    newDocs.repartition(2).write.mode("overwrite").parquet(s"$streamSrc/docs")
    var batches = 0
    val q = graft.streaming.DocsStream.runIndexAppend(dirA,
        spark.readStream.schema(graft.etl.Tables.documentsSchema)
          .option("maxFilesPerTrigger", "1").parquet(s"$streamSrc/docs")) { _ =>
      synchronized { batches += 1 }
    }
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, "expected at least two appended microbatches")

    DedupOps.bandAppend(spark, dirB, newDocs)

    def rows(dir: String) = spark.table(DedupOps.bandIndexTable(spark, dir))
      .select(col("CorpusId"), col("band_id"), col("band_val"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows(dirA) === rows(dirB))
    assert(rows(dirA).nonEmpty)
    // the stream bumped the batch count once per microbatch
    val locA = BucketedTables.location(spark, DedupOps.bandIndexTable(spark, dirA))
    assert(BucketedTables.appendedBatches(locA.resolve("_corpus_fingerprint")) === batches)
  }

  test("mapGroupsWithState funnel over a two-file event stream matches batch events_funnel") {
    import spark.implicits._
    implicit val s = spark
    // events land as two microbatches; the per-user funnel state must
    // carry step progress across the file boundary
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_funnel")
    graft.etl.Tables.eventsRaw(spark, sfDir)
      .repartition(2).write.mode("overwrite").parquet(s"$streamDir/events")
    val events = EventsStream.readEventsStream(spark, s"$streamDir/events",
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val last = collection.mutable.Map.empty[Long, EventsStream.UserFunnel]
    val q = EventsStream.funnelProgress(events)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventsStream.UserFunnel], _: Long) =>
        val rows = batch.collect()
        last.synchronized { rows.foreach(u => last(u.user_id) = u) }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")

    // fold the per-user end states into the batch query's step rows
    val users1 = last.values.count(_.t1.isDefined).toLong
    val users2 = last.values.count(_.t2.isDefined).toLong
    val users3 = last.values.count(_.t3.isDefined).toLong
    val batchRows = EventsOps.funnel(spark, sfDir).collect()
      .map(r => r.getAs[Int]("Step") ->
        ((r.getAs[Long]("Users"), r.getAs[Double]("CumRate"), r.getAs[Double]("StepRate")))).toMap
    assert(users1 > 0 && users2 > 0 && users3 > 0, "vacuous funnel")
    assert(batchRows(1)._1 === users1)
    assert(batchRows(2)._1 === users2)
    assert(batchRows(3)._1 === users3)
    // the rates are pure functions of the counts — recompute and match
    assert(batchRows(2)._2 === users2.toDouble / users1)
    assert(batchRows(3)._2 === users3.toDouble / users1)
    assert(batchRows(3)._3 === users3.toDouble / users2)
  }

  test("flatMapGroupsWithState transition pairs over a time-split two-file stream match the batch matrix") {
    import spark.implicits._
    implicit val s = spark
    // TIME split (not a hash split): the last-event state contract
    // requires per-user event time non-decreasing across triggers;
    // every transition straddling the cut is only found if the state
    // carried the pre-cut last event over the batch boundary
    val raw = graft.etl.Tables.eventsRaw(spark, sfDir)
    // place the cut INSIDE a real transition (midpoint of some
    // within-session consecutive pair) so at least one transition
    // straddles the file boundary BY CONSTRUCTION — a median cut can
    // land between sessions on a sparse corpus and test nothing
    val wcut = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val inPair = graft.etl.Tables.events(spark, sfDir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(wcut))
      .filter(col("prev_us").isNotNull &&
        col("us") - col("prev_us") <= 1800L * 1000000L &&
        col("us") > col("prev_us")) // strict gap: a midpoint exists
      .select(((col("prev_us") + col("us")) / 2).cast("bigint").as("CutUs"))
      .orderBy(col("CutUs"))
    assert(inPair.count() > 0, "corpus has no within-session transition with a positive gap")
    val cutNs = inPair.first().getLong(0) * 1000L
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_trans")
    stagePart(raw.filter(col("ts").cast("bigint") <= cutNs),
      streamDir.resolve("a.parquet"), Some(1000L))
    stagePart(raw.filter(col("ts").cast("bigint") > cutNs),
      streamDir.resolve("b.parquet"), Some(2000L))
    val events = EventsStream.readEventsStream(spark, streamDir.toString,
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val pairs = collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = EventsStream.transitionPairs(events)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventsStream.TransitionPair], _: Long) =>
        val rows = batch.collect()
        pairs.synchronized { rows.foreach(p => pairs += ((p.from, p.to))) }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")
    val got = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = graft.ops.EventsOps.transitionMatrix(spark, sfDir).collect()
      .map(r => (r.getAs[String]("From"), r.getAs[String]("To")) ->
        r.getAs[Long]("NTransitions")).toMap
    assert(got === want, "streamed transition counts diverge from the batch matrix")
    // non-vacuous straddle: at least one user has events on both sides
    // of the cut within one session (else the state carry is untested)
    val wus = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val straddle = graft.etl.Tables.events(spark, sfDir)
      .withColumn("us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(wus))
      .filter(col("prev_us").isNotNull &&
        col("us") - col("prev_us") <= 1800L * 1000000L &&
        col("prev_us") <= lit(cutNs / 1000L) && col("us") > lit(cutNs / 1000L))
      .count()
    assert(straddle > 0, "no cut-straddling transition — split landed degenerately")
  }

  test("stream-stream interval join over a two-file event stream matches batch click attribution") {
    // a true stream-stream join: both sides are streaming, pairs are
    // emitted as their second half arrives across microbatch
    // boundaries. Delay spans the corpus so the hash-split replay
    // (arbitrary event order) drops nothing — per-user aggregates of
    // the emitted pairs must equal the batch interval join exactly.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_attr")
    graft.etl.Tables.eventsRaw(spark, sfDir)
      .repartition(2).write.mode("overwrite").parquet(s"$streamDir/events")
    val events = EventsStream.readEventsStream(spark, s"$streamDir/events",
      maxFilesPerTrigger = Some(1))
    val q = EventsStream.clickAttribution(events, delay = "3650 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_pairs").start()
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty microbatches")
    val got = spark.table("attr_pairs")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("Pairs"),
        min(col("LagUs")).as("MinLagUs"),
        max(col("LagUs")).as("MaxLagUs"),
        sum(col("LagUs")).as("SumLagUs"))
      .orderBy(col("user_id")).collect()
    assert(got.nonEmpty)
    // no pair emitted twice: total pair count equals the batch join's
    val batch = EventsOps.clickAttribution(spark, sfDir).collect()
    assert(got.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "stream-stream join diverged from the batch interval join")
  }

  test("native session_window streaming agg finalizes every batch session exactly") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val raw = graft.etl.Tables.eventsRaw(spark, sfDir)
    val cutNs = raw.selectExpr("CAST(percentile_approx(ts, 0.5) AS BIGINT)").first().getLong(0)
    val maxNs = raw.selectExpr("CAST(max(ts) AS BIGINT)").first().getLong(0)
    // time-ordered staging (no late data), plus a far-future sentinel
    // event for a dummy user: its arrival pushes the watermark past
    // every real session's end, so append mode finalizes ALL of them —
    // the sentinel's own session stays in-flight and is never emitted
    val streamDir = Files.createTempDirectory("graft_stream_sess")
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit =
      stagePart(df, streamDir.resolve(name), Some(mtime))
    val t0 = System.currentTimeMillis() - 60000
    stage(raw.filter(col("ts") <= cutNs), "a_half1.parquet", t0)
    stage(raw.filter(col("ts") > cutNs), "b_half2.parquet", t0 + 10000)
    stage(raw.limit(1).select(
      lit(-1L).as("event_id"),
      lit(maxNs + 30L * 86400L * 1000000000L).as("ts"),
      lit(-1L).as("user_id"),
      lit("view").as("event_type"),
      lit(0.0).as("value"),
      lit("{}").as("props")), "c_flush.parquet", t0 + 20000)
    val q = EventsStream.sessionValueCounts(
        EventsStream.readEventsStream(spark, streamDir.toString,
          maxFilesPerTrigger = Some(1)),
        delay = "1 second")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_windows").start()
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    val got = spark.table("sess_windows")
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("StartUs")).collect()
    val batch = EventsOps.sessionWindows(spark, sfDir).collect()
    assert(got.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "streaming session_window diverged from the batch twin")
    // a session straddling the file cut proves cross-batch merging
    val straddle = batch.exists { r =>
      r.getAs[Long]("StartUs") <= cutNs / 1000 && r.getAs[Long]("EndUs") > cutNs / 1000
    }
    assert(straddle, "no session straddles the staged cut — merge untested")
  }

  test("hourly agg runs on an UNBOUNDED rate source (broker stand-in): counts conserve input rows") {
    // No broker jar ships in this offline image; the rate source is
    // the standard unbounded stand-in — this proves the windowed
    // operator is source-agnostic (event-time only), not coupled to
    // the FileStreamSource the other tests use. Update-mode sink rows
    // are per-trigger snapshots, so per-key NEvents is monotone and
    // the LAST snapshot per key must conserve the exact input total.
    // The input total comes from a StreamingQueryListener accumulator,
    // NOT recentProgress: the progress buffer retains only
    // numRecentProgressUpdates entries (default 100), so a slow run
    // past 100 microbatches would silently undercount and fail the
    // exact-equality check spuriously; the listener sees every
    // progress event with no retention limit.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val nonEmptyBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "rate_hourly") {
          inputRows.addAndGet(e.progress.numInputRows)
          if (e.progress.numInputRows > 0) nonEmptyBatches.incrementAndGet()
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener) // before start(): no missed events
    try {
      val ev = spark.readStream.format("rate")
        .option("rowsPerSecond", "500").option("numPartitions", "2").load()
        .select(col("timestamp").as("ts"),
          element_at(lit(Array("view", "click", "purchase", "signup", "error")),
            (col("value") % 5).cast("int") + 1).as("event_type"),
          (col("value") % 100).cast("double").as("value"))
      val q = EventsStream.hourlyCounts(ev)
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .format("memory").queryName("rate_hourly").start()
      val deadline = System.currentTimeMillis() + 60000
      while (nonEmptyBatches.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.processAllAvailable() // drain what the last trigger admitted
      q.stop()
      // listener events are delivered async on the listener-bus
      // thread: wait until the accumulator goes quiet before reading
      val quietBy = System.currentTimeMillis() + 30000
      var last = -1L
      while (last != inputRows.get() && System.currentTimeMillis() < quietBy) {
        last = inputRows.get()
        Thread.sleep(500)
      }
      assert(nonEmptyBatches.get() >= 2,
        "rate source never produced two non-empty batches")
      val input = inputRows.get()
      val counted = spark.table("rate_hourly")
        .groupBy(col("WindowStart"), col("event_type"))
        .agg(max(col("NEvents")).as("N")) // last (= max) snapshot per key
        .agg(sum(col("N"))).head().getLong(0)
      assert(input > 0L)
      assert(counted === input,
        s"windowed counts ($counted) do not conserve the unbounded input ($input)")
    } finally spark.streams.removeListener(listener)
  }

  test("mapGroupsWithState sessionization survives a checkpointed restart with exact state") {
    import spark.implicits._
    implicit val s = spark
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val raw = graft.etl.Tables.eventsRaw(spark, sfDir)
    // split arrivals at the median event time: users with events on
    // BOTH sides only reconcile with the batch answer if the explicit
    // per-user GroupState (lastUs, nEvents, nSessions) survived the
    // process restart — lost state would reset their running counts
    val cutNs = raw.selectExpr("CAST(percentile_approx(ts, 0.5) AS BIGINT)").first().getLong(0)
    val streamDir = Files.createTempDirectory("graft_mgs_in")
    val ckDir = Files.createTempDirectory("graft_mgs_ck").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stagePart(df, streamDir.resolve(name))
    // the upsert sink: one map shared across both process incarnations
    // (update mode re-emits only changed groups, so survivors of run 1
    // keep their values and straddling users get overwritten in run 2)
    val acc = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    def runOnce(): Unit = {
      val events = EventsStream.readEventsStream(spark, streamDir.toString)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventsStream.Event]
      val q = EventsStream.sessionCounts(events)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStream.UserSessions], _: Long) =>
          b.collect().foreach(u => acc.put(u.user_id, (u.nEvents, u.nSessions)))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    stage(raw.filter(col("ts") <= cutNs), "a_half1.parquet")
    runOnce()
    stage(raw.filter(col("ts") > cutNs), "b_half2.parquet")
    runOnce() // restart from the same checkpoint — resumes, not replays
    val batch = EventsOps.sessionize(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("NEvents"), r.getAs[Long]("NSessions")))).toMap
    // the premise that makes equality a state-survival proof
    val h1 = raw.filter(col("ts") <= cutNs).select(col("user_id")).distinct()
    val straddlers = h1.join(
      raw.filter(col("ts") > cutNs).select(col("user_id")).distinct(),
      Seq("user_id"), "inner").count()
    assert(straddlers > 0L, "no user straddles the cut — restart untested")
    assert(acc.asScala.toMap === batch,
      "restarted mapGroupsWithState diverged from batch sessionize (state lost or replayed)")
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

  test("drift histogram state accumulates across TWO microbatches to the batch card") {
    import java.nio.file.Files
    graft.functions.TextExpressions.register(spark)
    val docs = graft.etl.Tables.documents(spark, sfDir)
    val watch = Files.createTempDirectory("graft_drift_watch")
    try {
      stagePart(docs.filter(col("doc_id") % 2 === 0), watch.resolve("h1.parquet"))
      val perSource = graft.ops.TextOps.driftPerSource(
        graft.streaming.DocsStream.readDocsStream(spark, watch.toString)
          .withColumn("TS", expr("token_stats(text)")))
      val q = perSource.writeStream
        .outputMode("complete").format("memory").queryName("drift_2b").start()
      try {
        q.processAllAvailable()
        val afterB1 = spark.table("drift_2b")
          .agg(sum(col("NDocs"))).collect()(0).getLong(0)
        val total = docs.count()
        assert(afterB1 > 0 && afterB1 < total,
          s"first trigger saw $afterB1 of $total docs — two-batch split did not happen")
        stagePart(docs.filter(col("doc_id") % 2 === 1), watch.resolve("h2.parquet"))
        q.processAllAvailable()
      } finally q.stop()
      // the accumulated state, shaped by the SAME chi2 kernel, equals
      // the batch card row-for-row (values AND flags)
      val got = graft.ops.TextOps.driftFromPerSource(spark.table("drift_2b"))
        .collect().map(_.toSeq).toSeq
      val want = graft.ops.TextOps.driftChisq(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(got === want, "two-microbatch drift state diverged from the batch card")
      spark.catalog.dropTempView("drift_2b")
    } finally graft.ops.BucketedTables.deleteRecursively(watch)
  }

  test("kmv source sketches: per-batch partials merged by re-sketching equal the whole-corpus sketch; stream twin equals batch estimates") {
    // the composability claim the streaming twin rests on: bottom-k
    // of a union of bottom-ks IS the bottom-k of the union, so an
    // ARBITRARY batch split (here doc_id parity — interleaved, not a
    // prefix) merges to exactly the whole-corpus sketch
    val docs = graft.etl.Tables.documents(spark, sfDir)
    val p1 = graft.streaming.DocsStream.sourceSketchBatch(
      spark, docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val p2 = graft.streaming.DocsStream.sourceSketchBatch(
      spark, docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    val merged = graft.ops.TextOps.kmvSketchOf(
      p1.unionByName(p2).select(col("source"), explode(col("Ks")).as("V")))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val whole = graft.streaming.DocsStream.sourceSketchBatch(spark, docs)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged.keySet === whole.keySet)
    whole.foreach { case (s, ks) =>
      assert(merged(s) === ks, s"merged sketch diverged for source $s")
    }
    // end-to-end: the one-shot stream twin's estimate columns equal
    // the batch query's (same sketches, same pair math definition)
    val stream = graft.streaming.DocsStream
      .sourceOverlapStreamQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val batch = graft.ops.TextOps.sourceOverlapKmv(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("EstUnion"), r.getAs[Double]("EstOverlap"))).toMap
    assert(stream.keySet === batch.keySet)
    assert(stream.keySet.size === 190)
    batch.foreach { case (k, v) =>
      assert(stream(k) === v, s"stream estimate diverged from batch for $k")
    }
    // the DIFFERENCE twin rides the same merged sketches: its
    // estimate columns must equal the batch difference query's
    val dStream = graft.streaming.DocsStream
      .sourceDifferenceStreamQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("EstAOnly"), r.getAs[Double]("EstBOnly"),
          r.getAs[Double]("ContainAB"))).toMap
    val dBatch = graft.ops.TextOps.sourceDifferenceKmv(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("EstAOnly"), r.getAs[Double]("EstBOnly"),
          r.getAs[Double]("ContainAB"))).toMap
    assert(dStream.keySet === dBatch.keySet)
    dBatch.foreach { case (k, v) =>
      assert(dStream(k) === v, s"difference twin diverged from batch for $k")
    }
  }

  test("kmv upsert twin: each trigger publishes estimates equal to a batch run over its prefix, across a restart") {
    // the incremental-publication form (r14 verdict #7): the sketch
    // TABLE is the only state, each trigger publishes estimates
    // re-derived from it, and a restart between triggers must change
    // nothing — the checkpoint resumes the source and the table
    // carries the sketches
    import java.nio.file.Files
    val docs = graft.etl.Tables.documents(spark, sfDir)
    val watch = Files.createTempDirectory("graft_kmv_watch")
    val tableDir = Files.createTempDirectory("graft_kmv_table")
    val ckDir = Files.createTempDirectory("graft_kmv_ck")
    val table = tableDir.resolve("sketches").toString
    def estMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("SA"), r.getAs[String]("SB")) ->
        (r.getAs[Double]("EstUnion"), r.getAs[Double]("EstOverlap"))).toMap
    def diffMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("SA"), r.getAs[String]("SB")) ->
        (r.getAs[Double]("EstAOnly"), r.getAs[Double]("EstBOnly"),
          r.getAs[Double]("ContainAB"))).toMap
    try {
      val published = collection.mutable.ArrayBuffer
        .empty[(Long, Map[(String, String), (Double, Double)])]
      val publishedDiff = collection.mutable.ArrayBuffer
        .empty[Map[(String, String), (Double, Double, Double)]]
      // each call is a FRESH query resuming from the same checkpoint —
      // the second run is the restart
      def runOnce(): Unit = {
        val q = graft.streaming.DocsStream.runSourceSketchUpsert(
          spark,
          graft.streaming.DocsStream.readDocsStream(spark, watch.toString),
          table, ckDir.toString) { (id, est, diff) =>
          val m = estMap(est)
          val d = diffMap(diff)
          published.synchronized { published += ((id, m)); publishedDiff += d; () }
        }
        try q.processAllAvailable() finally q.stop()
      }
      stagePart(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        watch.resolve("h1.parquet"))
      runOnce()
      assert(published.nonEmpty, "first trigger published nothing")
      // mid-stream publication == batch pair math over EXACTLY the
      // docs seen so far (the interleaved half, not a trivial prefix)
      val prefixSketches = graft.streaming.DocsStream.sourceSketchBatch(
        spark, docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      val wantMid = estMap(graft.ops.TextOps.kmvPairEstimates(prefixSketches))
      assert(published.last._2 === wantMid,
        "mid-stream publication diverged from the batch run over the prefix")
      // the DIFFERENCE card rides the same publication (r15 verdict
      // #3): mid-stream difference row == batch difference math over
      // the same prefix sketches
      val wantMidDiff = diffMap(
        graft.ops.TextOps.kmvDifferenceEstimates(prefixSketches))
      assert(publishedDiff.last === wantMidDiff,
        "mid-stream difference card diverged from the batch run over the prefix")
      stagePart(docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        watch.resolve("h2.parquet"))
      runOnce() // restart: same checkpoint, same table, new query
      // final publication == the batch query's estimate columns over
      // the whole corpus (the same 190-pair frame the gate hashes)
      val wantFull = estMap(graft.ops.TextOps.sourceOverlapKmv(spark, sfDir))
      assert(published.last._2 === wantFull,
        "post-restart publication diverged from the whole-corpus batch query")
      assert(published.last._2.size === 190)
      // and the final difference card == the streaming difference
      // twin's declared columns over the whole corpus
      val wantFullDiff = diffMap(graft.ops.TextOps.kmvDifferenceEstimates(
        graft.streaming.DocsStream.sourceSketchBatch(spark, docs)))
      assert(publishedDiff.last === wantFullDiff,
        "post-restart difference card diverged from the whole-corpus batch math")
      // the restart processed ONLY the new file (offsets resumed, so
      // batch ids advanced instead of replaying)
      assert(published.map(_._1).distinct.size === published.size,
        s"a batch id was published twice: ${published.map(_._1)}")
      // exactly ONE committed generation remains after pruning, and
      // the table read comes back through it
      val gens = graft.streaming.DocsStream.latestSketchGeneration(spark, table)
      assert(gens.nonEmpty, "no committed generation after two triggers")
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .count() === 20)
    } finally {
      graft.ops.BucketedTables.deleteRecursively(watch)
      graft.ops.BucketedTables.deleteRecursively(tableDir)
      graft.ops.BucketedTables.deleteRecursively(ckDir)
    }
  }

  test("sketch table generations: file: URI portability, crash-window atomicity, prune") {
    // the persistence seam of runSourceSketchUpsert in isolation
    // (r15 verdict #4 + advice): existence/read/write go through the
    // Hadoop FileSystem API resolved from the table path's OWN scheme
    // — exercised here via an explicit file: URI (the API seam a
    // java.io.File check cannot serve on HDFS/S3) — and a generation
    // missing its _SUCCESS marker (the crash window) must be
    // invisible to readers while the prior committed table survives
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.Row
    val tmp = Files.createTempDirectory("graft_gen_table")
    val table = "file://" + tmp.resolve("sketches").toString
    try {
      val schema = graft.streaming.DocsStream.sketchTableSchema
      assert(graft.streaming.DocsStream.latestSketchGeneration(spark, table).isEmpty)
      assert(graft.streaming.DocsStream.readSketchTable(spark, table).count() === 0)
      def pin(rows: Seq[Row]) = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      val g0 = graft.streaming.DocsStream.writeSketchGeneration(
        spark, pin(Seq(Row("a", Seq(1L, 2L)))), table)
      assert(g0.endsWith("gen-0000000000000000"))
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .collect().map(_.getString(0)).toSeq === Seq("a"))
      val g1 = graft.streaming.DocsStream.writeSketchGeneration(
        spark, pin(Seq(Row("a", Seq(1L, 2L)), Row("b", Seq(3L)))), table)
      assert(g1.endsWith("gen-0000000000000001"))
      // the prior committed generation was pruned AFTER the commit
      val local = tmp.resolve("sketches")
      assert(!Files.exists(local.resolve("gen-0000000000000000")))
      // simulate the crash window: a newer generation dir WITHOUT a
      // _SUCCESS marker must not become the read source, and the
      // committed table must still be readable through it
      val partial = local.resolve("gen-0000000000000002")
      Files.createDirectories(partial)
      Files.write(partial.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
      assert(graft.streaming.DocsStream.latestSketchGeneration(spark, table)
        .exists(_._2.endsWith("gen-0000000000000001")))
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .count() === 2)
      // the next write lands OVER the dead partial dir and commits
      val g3 = graft.streaming.DocsStream.writeSketchGeneration(
        spark, pin(Seq(Row("c", Seq(9L)))), table)
      assert(g3.endsWith("gen-0000000000000002"))
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .collect().map(_.getString(0)).toSeq === Seq("c"))
    } finally {
      graft.ops.BucketedTables.deleteRecursively(tmp)
    }
  }

  test("sketch generation commit is config-independent (explicit _SUCCESS — r16 advice #1)") {
    // with mapreduce.fileoutputcommitter.marksuccessfuljobs=false (a
    // common object-store deployment) FileOutputCommitter writes NO
    // _SUCCESS — before r17 no generation ever looked committed, so
    // readSketchTable returned empty on every trigger and every
    // publication silently under-reported. writeSketchGeneration now
    // creates the marker itself when the committer didn't.
    import java.nio.file.Files
    import org.apache.spark.sql.Row
    val tmp = Files.createTempDirectory("graft_gen_nomark")
    val table = "file://" + tmp.resolve("sketches").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = Option(hc.get(key))
    hc.set(key, "false")
    try {
      val schema = graft.streaming.DocsStream.sketchTableSchema
      def pin(rows: Seq[Row]) = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      val g0 = graft.streaming.DocsStream.writeSketchGeneration(
        spark, pin(Seq(Row("a", Seq(1L, 2L)))), table)
      assert(g0.endsWith("gen-0000000000000000"))
      assert(graft.streaming.DocsStream.latestSketchGeneration(spark, table)
        .exists(_._2.endsWith("gen-0000000000000000")),
        "generation invisible when the committer writes no _SUCCESS")
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .collect().map(_.getString(0)).toSeq === Seq("a"))
      // and the next upsert still merges FROM it, not from empty
      val g1 = graft.streaming.DocsStream.writeSketchGeneration(
        spark, pin(Seq(Row("a", Seq(1L, 2L)), Row("b", Seq(3L)))), table)
      assert(g1.endsWith("gen-0000000000000001"))
      assert(graft.streaming.DocsStream.readSketchTable(spark, table)
        .count() === 2)
    } finally {
      prev match { case Some(v) => hc.set(key, v); case None => hc.unset(key) }
      graft.ops.BucketedTables.deleteRecursively(tmp)
    }
  }
}
