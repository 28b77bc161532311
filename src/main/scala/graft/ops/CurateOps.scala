package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Training-corpus curation operators — the stages a real LLM data
  * pipeline runs AFTER per-doc analysis: deterministic dataset
  * splitting and the filter-compose step that turns raw documents
  * into a curated training set.
  */
object CurateOps {

  /** Split fractions over the 0..255 bucket space: < 204 → train
    * (~79.7%), < 230 → val (~10.2%), else test (~10.2%). */
  val TrainUpper = 204
  val ValUpper = 230

  /** Deterministic train/val/test assignment: bucket = first byte of
    * md5(doc_id), split by fixed thresholds. Properties a training
    * pipeline needs, all by construction: (1) stable — a document's
    * split never changes as the corpus grows (pure function of id, no
    * RNG state, no ordering dependence); (2) engine-portable — md5 is
    * bit-identical everywhere, so the DuckDB oracle reproduces the
    * assignment exactly; (3) uniform — md5 bytes are uniform, so
    * fractions converge at corpus scale. One narrow codegen pass, no
    * shuffle (presentation sort aside). */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("Bucket",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 2), 16, 10)
          .cast(IntegerType))
      .withColumn("Split",
        when(col("Bucket") < TrainUpper, "train")
          .when(col("Bucket") < ValUpper, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** Minimum quality score for [[curate]] — ≈ the corpus median
    * (scores on the synthetic docs range 0.04–0.48; length-capped at
    * NTokens/200 with docs of 10–99 tokens). */
  val MinQuality = 0.25

  /** End-to-end corpus curation — the composite an LLM data pipeline
    * actually ships: keep a document iff it (a) survives near-dup
    * clustering (DedupOps.components canonical survivor), (b) is
    * predicted English by the marker heuristic, and (c) clears the
    * quality threshold. Emits the curated doc list with its token
    * budget.
    *
    * Scale shape: two narrow one-pass scores (token_stats native
    * expression) + the bounded label-propagation survivor set, joined
    * on uniform doc_id keys — the whole filter composes into one
    * pipeline with no extra shuffle beyond the dedup stage it reuses.
    * All scores are exact-integer ratios, so the DuckDB oracle
    * reproduces every comparison bit-for-bit (threshold included). */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(spark)
    val scored = Tables.documents(spark, dir)
      .withColumn("TS", expr("token_stats(text)"))
      .select(col("doc_id"),
        col("TS.NTokens").as("NTokens"),
        col("TS.StopCount").as("StopCount"),
        col("TS.CEn").as("CEn"), col("TS.CEs").as("CEs"),
        col("TS.CDe").as("CDe"), col("TS.CFr").as("CFr"))
      .withColumn("QualityScore",
        TextOps.qualityScoreCol(col("NTokens"), col("StopCount")))
      .withColumn("Predicted",
        TextOps.predictedLangCol(col("CEn"), col("CEs"), col("CDe"), col("CFr")))
    val survivors = DedupOps.components(spark, dir)
      .filter(col("IsSurvivor")).select(col("doc_id"))
    scored.join(survivors, "doc_id")
      .filter(col("Predicted") === "en" && col("QualityScore") >= MinQuality)
      .select(col("doc_id"), col("NTokens"), col("QualityScore"))
      .orderBy(col("doc_id"))
  }
}
