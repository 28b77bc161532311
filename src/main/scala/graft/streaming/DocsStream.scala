package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.IntegerType

import graft.etl.Tables
import graft.ops.{CurateOps, DedupOps}

/** Streaming twins of the corpus-curation front door: documents arrive
  * as a stream (the ingestion firehose) and are checked against STATIC
  * reference relations — the eval shingle set (decontamination) and
  * the corpus band index (incremental dedup).
  *
  * Both twins run their kernel per microbatch via `foreachBatch`, the
  * pattern for operators that need full batch semantics inside each
  * trigger (per-pair candidate dedup; per-doc distinct counts) with
  * NO state store: nothing grows with stream history — a plain
  * streaming `groupBy` would pin one state row per document forever
  * (no watermark can evict by doc_id), which at firehose scale is a
  * slow OOM. Each doc lives in exactly one microbatch, so per-batch
  * results compose into exactly the batch answer (StreamingSpec).
  */
object DocsStream {

  /** A streaming source over a documents parquet dir. */
  def readDocsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.documentsSchema)
      .parquet(dir)

  private val onceCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage the documents parquet (one compacted file OR a dir of part
    * files) into a fresh temp dir so every staged file is visible
    * before `start()` — the parquet file source with no
    * maxFilesPerTrigger then takes the whole corpus in ONE batch.
    * Caller deletes the returned dir. */
  private[streaming] def stageDocsOnce(dir: String): java.nio.file.Path = {
    import java.nio.file.{Files, Path, Paths}
    val streamDir = Files.createTempDirectory("graft_docs_once")
    def stage(src: Path, dst: Path): Unit =
      if (Files.isDirectory(src)) {
        Files.createDirectories(dst)
        val listing = Files.list(src) // must close: holds a dir handle
        try listing.forEach(p => stage(p, dst.resolve(p.getFileName)))
        finally listing.close()
      } else Files.copy(src, dst)
    stage(Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    streamDir
  }

  /** Streaming twin of `text_drift_chisq`: documents stream in and a
    * SOURCE-KEYED streaming aggregation maintains each source's
    * token-length histogram incrementally — state is |sources| rows,
    * BOUNDED by construction (the opposite of a doc-keyed state,
    * which nothing can evict). Complete-mode output feeds the SAME
    * χ²-shaping kernel as the batch card (TextOps.driftFromPerSource
    * — one definition), so the batch oracle SQL hashes the streaming
    * run directly. This is the live form of the ingest-monitoring
    * card: in production each trigger publishes a fresh drift table;
    * the one-shot staging makes the final trigger's table equal the
    * batch answer. The driver-side collect is |sources| rows. */
  def driftChisqStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(spark)
    val streamDir = stageDocsOnce(dir)
    try {
      val docsTs = readDocsStream(spark, streamDir.toString)
        .withColumn("TS", expr("token_stats(text)"))
      val perSource = graft.ops.TextOps.driftPerSource(docsTs)
      val name = s"text_drift_once_${onceCounter.incrementAndGet()}"
      val q = perSource.writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      val schema = spark.table(name).schema
      val rows = spark.table(name).collect() // |sources| rows
      spark.catalog.dropTempView(name)
      val perS = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
        schema)
      graft.ops.TextOps.driftFromPerSource(perS)
    } finally graft.ops.BucketedTables.deleteRecursively(streamDir)
  }

  /** The per-batch decontamination kernel: per-train-doc distinct
    * eval-doc/shingle collision counts against the static `(Shingle,
    * EvalId)` relation (CurateOps.evalShingles or any curated
    * benchmark shingle set). The shingle window MUST match the one the
    * eval set was built with — both default to
    * CurateOps.DecontaminationShingleN, so the twin tracks the batch
    * query's widened round-8 default by construction. Batch semantics
    * — countDistinct is legal and exact. Emits only docs with ≥1
    * collision (inner join); the batch query zero-fills the clean
    * ones. */
  def decontaminateBatch(spark: SparkSession, docs: DataFrame,
                         evalSh: DataFrame,
                         n: Int = CurateOps.DecontaminationShingleN): DataFrame = {
    graft.functions.ShingleExpressions.register(spark)
    docs
      .filter(CurateOps.splitOf(col("doc_id")) === "train")
      // the ONE shingle-key definition (CurateOps.shingleKeysSql):
      // xxhash64 int64 at wide windows, raw strings at n == 3 — so
      // this side always matches whatever substrate evalShingles(n)
      // was built from (a hand-rolled hash here would join bigint
      // against string at n == 3 and silently report zero hits)
      .select(col("doc_id"),
        explode(expr(CurateOps.shingleKeysSql(n))).as("Shingle"))
      .join(evalSh, "Shingle")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("EvalId")).cast(IntegerType).as("NEvalDocs"),
        countDistinct(col("Shingle")).cast(IntegerType).as("NSharedShingles"))
  }

  /** Drive [[decontaminateBatch]] over a document stream, invoking
    * `sink` with each microbatch's contamination rows. `n` is the
    * shingle window and MUST match the one `evalSh` was built with —
    * threaded through (round 14) so non-default windows (n = 3's raw
    * string keys included) run the same end-to-end path the default
    * does, instead of only being reachable in the batch kernel. */
  def runDecontaminate(spark: SparkSession, docs: DataFrame,
                       evalSh: DataFrame,
                       n: Int = CurateOps.DecontaminationShingleN)
                      (sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(decontaminateBatch(spark, batch, evalSh, n))
      }
      .start()

  /** Streaming twin of `curate_decontaminate` for the driver gate: the
    * documents parquet staged as a one-shot firehose, every microbatch
    * checked against the static eval shingle set via the foreachBatch
    * kernel, hit rows accumulated and re-shaped through the SAME
    * zero-fill presentation the batch query uses — so the batch oracle
    * SQL hashes the streaming run directly. This puts the
    * foreachBatch-against-static-relations pattern (zero state store,
    * the ingestion-curation front door) inside the gate next to the
    * five stateful one-shots. The driver-side hit buffer is
    * contaminated-rows-sized (a production sink upserts hits to a
    * table and the shaping is a view over it). */
  def decontaminateStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    val streamDir = stageDocsOnce(dir)
    try {
      val evalSh = CurateOps.evalShingles(spark, dir)
      val buf = collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = runDecontaminate(spark,
        readDocsStream(spark, streamDir.toString), evalSh) { out =>
        val rows = out.collect()
        if (rows.nonEmpty) batches.incrementAndGet()
        buf.synchronized { buf ++= rows }
      }
      q.processAllAvailable()
      q.stop()
      // countDistinct rows are NOT composable across batches by plain
      // union (a doc split over two triggers would double-report) —
      // the one-shot staging above guarantees a single batch; assert
      // it rather than silently fan out in decontaminateShape
      require(batches.get() <= 1,
        s"decontaminateStreamQuery expected one-shot staging to yield one " +
          s"microbatch with hits, saw ${batches.get()} — per-batch distinct " +
          "counts do not compose by union")
      val hitSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("NEvalDocs", IntegerType),
        org.apache.spark.sql.types.StructField("NSharedShingles", IntegerType)))
      val hits = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(buf.toSeq).asJava),
        hitSchema)
      CurateOps.decontaminateShape(spark, dir, hits)
    } finally {
      graft.ops.BucketedTables.deleteRecursively(streamDir)
    }
  }

  /** Drive the incremental-dedup kernel (DedupOps.incrementalAgainst —
    * one definition with the batch query) over a document stream,
    * invoking `sink` with each microbatch's verified matches (e.g. an
    * upsert into the dup registry). `corpusBands` is the static
    * `(CorpusId, band_id, band_val, ShC)` relation — the session's
    * cached sketch table or the persisted bucketed band index. */
  def runIncrementalDedup(spark: SparkSession, docs: DataFrame,
                          corpusBands: DataFrame)
                         (sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(DedupOps.incrementalAgainst(spark, batch, corpusBands))
      }
      .start()

  /** The per-batch KMV kernel: each document microbatch reduces to
    * one k-long sketch row per source it touches (TextOps.kmvSketchOf
    * over the ONE shingle-hash definition, TextOps.shingleHashCol).
    * Unlike the countDistinct kernels above, these partials COMPOSE
    * across any batch split — bottom-k of a union of bottom-ks is the
    * bottom-k of the union — so no one-shot staging assumption is
    * needed: the stream maintains per-source sketches incrementally
    * and any trigger can publish overlap estimates. */
  def sourceSketchBatch(spark: SparkSession, docs: DataFrame): DataFrame =
    graft.ops.TextOps.kmvSketchOf(docs
      .withColumn("Toks", expr(graft.ops.TextOps.toksSql))
      .select(col("source"),
        explode(expr(graft.ops.TextOps.shinglesSql)).as("Shingle"))
      .select(col("source"),
        graft.ops.TextOps.shingleHashCol(col("Shingle")).as("V")))

  /** Drive [[sourceSketchBatch]] over a document stream — `sink`
    * receives each microbatch's per-source partial sketches (a
    * production sink upserts them into a sketch table; merging is the
    * same kmv_kmin aggregation over the accumulated rows). */
  def runSourceSketch(spark: SparkSession, docs: DataFrame)
                     (sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(sourceSketchBatch(spark, batch))
      }
      .start()

  /** Schema of the persisted per-source sketch table
    * ([[runSourceSketchUpsert]]): one row per source, `Ks` = the
    * bottom-k shingle hashes. */
  private[graft] val sketchTableSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("Ks",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))))

  /** Latest COMMITTED generation of a persisted sketch table: the
    * highest-numbered `gen-N` child directory carrying a `_SUCCESS`
    * marker. Hadoop FileSystem API, not `java.io.File` (r15 watch
    * item: the 100 TB home of a persisted sketch table is HDFS/S3,
    * where a local-FS existence check silently reports absent and
    * the first trigger would clobber a real table) — the path
    * resolves through `tablePath`'s own scheme, so `file:`/`hdfs:`/
    * `s3a:` URIs all work. */
  private[graft] def latestSketchGeneration(
      spark: SparkSession, tablePath: String): Option[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith("gen-")) None
        else scala.util.Try(n.stripPrefix("gen-").toLong).toOption
          .filter(_ => fs.exists(
            new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          .map(g => (g, st.getPath.toString))
      }
      .sortBy(_._1).lastOption
  }

  /** Read the persisted sketch table — its latest committed
    * generation, or an empty frame if none exists yet. */
  private[graft] def readSketchTable(
      spark: SparkSession, tablePath: String): DataFrame =
    latestSketchGeneration(spark, tablePath) match {
      case Some((_, genPath)) =>
        spark.read.schema(sketchTableSchema).parquet(genPath)
      case None => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        sketchTableSchema)
    }

  /** Publish one new generation of the sketch table ATOMICALLY
    * (advice r15: a bare `mode("overwrite")` to the table path
    * deletes the committed table BEFORE the new write commits — a
    * crash in that window loses every prior source's sketches, and
    * the restart's checkpoint replays only the in-flight batch, so
    * the merge silently proceeds from empty and every later
    * publication under-reports). Here the previous generation
    * survives until `gen-(N+1)/_SUCCESS` exists: a crash mid-write
    * leaves an uncommitted dir that [[latestSketchGeneration]]
    * ignores and the next trigger overwrites. Older committed
    * generations are pruned only AFTER the new commit (a crash
    * between commit and prune just leaves extra dirs for the next
    * trigger's prune). Returns the committed generation path. */
  private[graft] def writeSketchGeneration(
      spark: SparkSession, pinned: DataFrame, tablePath: String): String = {
    val next = latestSketchGeneration(spark, tablePath).map(_._1 + 1).getOrElse(0L)
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val genPath = new org.apache.hadoop.fs.Path(root, f"gen-$next%016d")
    pinned.coalesce(1).write.mode("overwrite").parquet(genPath.toString)
    // the commit marker must exist CONFIG-INDEPENDENTLY (r17, r16
    // advice #1): FileOutputCommitter only writes _SUCCESS when
    // mapreduce.fileoutputcommitter.marksuccessfuljobs is true — a
    // common object-store deployment disables it, and then NO
    // generation ever looks committed: latestSketchGeneration returns
    // None forever, every merge silently proceeds from the current
    // batch alone, and every publication under-reports. Create the
    // marker explicitly when the write didn't.
    val marker = new org.apache.hadoop.fs.Path(genPath, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, false).close()
    // prune only generations STRICTLY OLDER than the one just
    // committed (r17, r16 advice #3): an unconditional
    // everything-but-mine sweep would delete a NEWER generation
    // committed by a misconfigured second writer sharing the table
    // path; single-writer remains the contract, but the prune no
    // longer destroys evidence of its violation.
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith("gen-")) None
        else scala.util.Try(n.stripPrefix("gen-").toLong).toOption
          .filter(_ < next).map(_ => st.getPath)
      }
      .foreach(fs.delete(_, true))
    genPath.toString
  }

  /** Incremental PUBLICATION of the source-overlap AND
    * source-difference estimates (round 15/16 — makes the "any
    * trigger can publish" claim executable for BOTH cards): maintain
    * a persisted per-source sketch table via a foreachBatch upsert.
    * Each trigger folds its microbatch to per-source partials
    * ([[sourceSketchBatch]]), merges them into the table by
    * re-sketching the union (EXACT — the KMV composability property
    * the parity spec proves), publishes a new table generation
    * atomically ([[writeSketchGeneration]]), and hands `publish` the
    * fresh pair estimates derived from it — the overlap card
    * (TextOps.kmvPairEstimates) and the difference card
    * (TextOps.kmvDifferenceEstimates), both the ONE pair-math
    * definition shared with the batch queries; the difference card
    * is sketch-only by construction, which is exactly why the
    * maintained table can serve it with no further state.
    *
    * The table is the ONLY state, so the twin is restart-proof two
    * ways: unreplayed batches merge in after a restart (checkpointed
    * source offsets), and a REPLAYED batch (foreachBatch is
    * at-least-once on crash) is absorbed exactly — a bottom-k union
    * is idempotent under duplicate elements, so re-merging the same
    * partial cannot move any sketch. State = |sources| × k longs
    * however long the stream runs; the upsert pins the merged table
    * on the driver (sketch-scale by construction) so no generation
    * write ever reads the path it replaces. */
  def runSourceSketchUpsert(spark: SparkSession, docs: DataFrame,
                            tablePath: String, checkpointDir: String)
                           (publish: (Long, DataFrame, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val partials = sourceSketchBatch(spark, batch)
        val prior = readSketchTable(spark, tablePath)
        val merged = graft.ops.TextOps.kmvSketchOf(
          prior.unionByName(partials)
            .select(col("source"), explode(col("Ks")).as("V")))
        val pinned = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(
              merged.collect().toSeq).asJava),
          sketchTableSchema)
        writeSketchGeneration(spark, pinned, tablePath)
        publish(batchId,
          graft.ops.TextOps.kmvPairEstimates(pinned)
            .select(col("SA"), col("SB"), col("Matched"),
              col("EstUnion"), col("EstOverlap")),
          graft.ops.TextOps.kmvDifferenceEstimates(pinned)
            .select(graft.ops.TextOps.DifferenceEstimateCols.map(col): _*))
      }
      .start()

  /** Streaming twin of `sketch_source_overlap`, emitting the DECLARED
    * production columns (the estimate side only — the batch query's
    * ExactOverlap/ErrOk certificate needs the whole corpus, which an
    * ingestion stream by definition does not have): documents stream
    * in, each microbatch folds to per-source partial KMV sketches,
    * the partials merge by re-sketching their union (exact, the KMV
    * property — spec-proven equal across batch splits), and the
    * merged sketches run the SAME pair math as the batch query
    * (TextOps.kmvPairEstimates, one definition). State is
    * |sources| × k longs however long the stream runs. */
  def sourceOverlapStreamQuery(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.kmvPairEstimates(mergedSourceSketchesOnce(spark, dir))
      .select(col("SA"), col("SB"), col("Matched"),
        col("EstUnion"), col("EstOverlap"))
      .transform(graft.etl.Summaries.smallSort(_, col("SA"), col("SB")))

  /** Streaming twin of `sketch_source_difference` — the directional
    * |A\\B| / |B\\A| and containment ESTIMATES are sketch-only
    * statistics (TextOps.kmvDifferenceEstimates), so the same merged
    * per-source sketches the overlap twin maintains serve them with
    * no further state; the batch query's exact certificates need the
    * whole corpus an ingestion stream does not have. */
  def sourceDifferenceStreamQuery(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.kmvDifferenceEstimates(mergedSourceSketchesOnce(spark, dir))
      .select(graft.ops.TextOps.DifferenceEstimateCols.map(col): _*)
      .transform(graft.etl.Summaries.smallSort(_, col("SA"), col("SB")))

  /** One-shot stream → merged per-source KMV sketches: stage the
    * corpus as a file stream, fold each microbatch to per-source
    * partials, merge by re-sketching the union (exact — the KMV
    * composability property). Shared by both sketch stream twins. */
  private def mergedSourceSketchesOnce(spark: SparkSession, dir: String): DataFrame = {
    val streamDir = stageDocsOnce(dir)
    try {
      val buf = collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = runSourceSketch(spark, readDocsStream(spark, streamDir.toString)) {
        out => val rows = out.collect(); buf.synchronized { buf ++= rows }
      }
      q.processAllAvailable()
      q.stop()
      val partials = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(buf.toSeq).asJava),
        sketchTableSchema)
      graft.ops.TextOps.kmvSketchOf(
        partials.select(col("source"), explode(col("Ks")).as("V")))
    } finally graft.ops.BucketedTables.deleteRecursively(streamDir)
  }

  /** Streaming INDEX MAINTENANCE, text side — the mirror of
    * VecsStream.runIndexAppend: each admitted document microbatch is
    * appended to the persisted band index via `DedupOps.bandAppend`
    * (sketch, explode, append THROUGH the bucket spec, batch-count
    * bump, periodic compaction). Together with [[runIncrementalDedup]]
    * this closes the text ingestion loop: probe the index for dups,
    * admit the survivors, append them so the NEXT batch probes against
    * them too. Kernel runs on the batch's session (the foreachBatch
    * seam); mutations serialize on the band build lock. */
  def runIndexAppend(dir: String, docs: DataFrame)
                    (afterBatch: String => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        afterBatch(DedupOps.bandAppend(batch.sparkSession, dir, batch))
      }
      .start()
}
