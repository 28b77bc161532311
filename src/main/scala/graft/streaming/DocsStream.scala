package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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
}
