package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.etl.Tables
import graft.ops.CurateOps

/** Streaming twin of the corpus-curation front door: documents arrive
  * as a stream (the ingestion firehose) and are checked for train/eval
  * contamination against a STATIC eval shingle set — the stream-static
  * join pattern. The static side is Spark's per-microbatch re-readable
  * relation; no state store is involved in the join itself, so the
  * operator scales with the stream, not with history.
  *
  * Semantics contract with the batch twin (CurateOps.decontaminate):
  * same split hash, same native `token_shingles`, same counts — the
  * stream emits only documents with ≥1 eval collision (inner join);
  * the batch query zero-fills the clean ones. Distinct counts use
  * `size(collect_set(...))` because streaming aggregation forbids
  * countDistinct; per-doc state is bounded by the doc's own shingle
  * count and each doc_id lives in exactly one microbatch.
  */
object DocsStream {

  /** A streaming source over a documents parquet dir. */
  def readDocsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.documentsSchema)
      .parquet(dir)

  /** Per-train-doc contamination counts over the incoming stream.
    * `evalSh` is the static `(Shingle, EvalId)` relation
    * (CurateOps.evalShingles or any curated benchmark shingle set). */
  def decontaminateStream(spark: SparkSession, docs: DataFrame,
                          evalSh: DataFrame): DataFrame = {
    graft.functions.ShingleExpressions.register(spark)
    docs
      .filter(CurateOps.splitOf(col("doc_id")) === "train")
      .select(col("doc_id"), explode(expr("token_shingles(text)")).as("Shingle"))
      .join(evalSh, "Shingle") // stream-static: static side rejoined per microbatch
      .groupBy(col("doc_id"))
      .agg(
        size(collect_set(col("EvalId"))).cast(IntegerType).as("NEvalDocs"),
        size(collect_set(col("Shingle"))).cast(IntegerType).as("NSharedShingles"))
  }

  /** The per-batch kernel of streaming incremental dedup: sketch the
    * arriving documents (same native MinHash-band expressions as
    * batch), join their band rows against the indexed corpus's band
    * listing, exact-Jaccard-verify the collisions. A pure batch
    * function — [[runIncrementalDedup]] applies it per microbatch via
    * `foreachBatch`, the standard pattern when an operator needs full
    * batch semantics (here: candidate de-duplication when a pair
    * collides on several bands) inside each trigger WITHOUT a state
    * store. Nothing grows with stream history: every match depends
    * only on the arriving doc and the static index.
    *
    * `corpusBands` is the static `(CorpusId, band_id, band_val, ShC)`
    * relation — the session's cached sketch table here, the persisted
    * band index at production scale. */
  def incrementalDedupBatch(newDocs: DataFrame, corpusBands: DataFrame): DataFrame = {
    val newSide = newDocs
      .select(col("doc_id").as("NewId"), expr("token_shingles(text)").as("ShN"))
      .withColumn("Bands", expr("minhash_bands(ShN)"))
      .select(col("NewId"), col("ShN"),
        posexplode(col("Bands")).as(Seq("BandIdx", "band_val")))
      .select(col("NewId"), col("ShN"),
        (col("BandIdx") + 1).as("band_id"), col("band_val"))
    newSide
      .join(corpusBands, Seq("band_id", "band_val"))
      .select(col("NewId"), col("CorpusId"), col("ShN"), col("ShC"))
      .dropDuplicates("NewId", "CorpusId") // batch semantics: intra-batch only
      .withColumn("NInter", size(array_intersect(col("ShN"), col("ShC"))))
      .withColumn("NUnion", size(col("ShN")) + size(col("ShC")) - col("NInter"))
      .withColumn("Jaccard", col("NInter").cast(DoubleType) / col("NUnion"))
      .filter(col("Jaccard") >= 0.5)
      .select(col("NewId"), col("CorpusId"), col("NInter"), col("NUnion"), col("Jaccard"))
  }

  /** Drive [[incrementalDedupBatch]] over a document stream, invoking
    * `sink` with each microbatch's verified matches (e.g. an upsert
    * into the dup registry). Returns the started query. */
  def runIncrementalDedup(spark: SparkSession, docs: DataFrame,
                          corpusBands: DataFrame)
                         (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    graft.functions.ShingleExpressions.register(spark)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(incrementalDedupBatch(batch, corpusBands))
      }
      .start()
  }
}
