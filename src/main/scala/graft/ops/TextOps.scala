package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Text-analysis operators over `documents`: tokenization stats,
  * quality scoring, language-ID heuristic, content fingerprinting.
  *
  * Everything is built from codegen'd Catalyst higher-order functions
  * (transform/filter/aggregate over the token array) — no UDFs, so the
  * whole pipeline stays inside WholeStageCodegen and scales linearly
  * with one narrow pass over the documents (no shuffle at all except
  * final presentation sorts).
  *
  * Determinism: all scores are ratios of exact integer counts; hashes
  * are md5 (identical in DuckDB); token order is the document's own.
  */
object TextOps {

  /** Whitespace tokenizer (the engine's declared token semantics). */
  val toksSql = "split(trim(text), '\\\\s+')"

  /** 3-gram token shingles of a `Toks` array column (distinct). */
  val shinglesSql: String =
    """CASE WHEN size(Toks) >= 3 THEN array_distinct(transform(sequence(1, size(Toks) - 2),
      |  i -> concat(element_at(Toks, i), ' ', element_at(Toks, i + 1), ' ', element_at(Toks, i + 2))))
      |ELSE cast(array() as array<string>) END""".stripMargin

  /** Language marker stopword lists (shared with the oracle SQL). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private def sqlList(xs: Seq[String]): String = xs.map("'" + _ + "'").mkString(", ")

  /** THE quality-score formula (single definition — [[quality]] and
    * CurateOps.curate must never drift apart; the DuckDB mirrors
    * transcribe this expression). */
  def qualityScoreCol(nTokens: Column, stopCount: Column): Column =
    least(lit(1.0), nTokens.cast(DoubleType) / 200.0) *
      (lit(1.0) - stopCount.cast(DoubleType) / nTokens)

  /** THE marker-argmax language prediction with its fixed tie-break
    * order (single definition, shared with CurateOps.curate). */
  def predictedLangCol(cEn: Column, cEs: Column, cDe: Column, cFr: Column): Column =
    when(cEn >= greatest(cEs, cDe, cFr), "en")
      .when(cEs >= greatest(cDe, cFr), "es")
      .when(cDe >= cFr, "de")
      .otherwise("fr")

  /** All per-doc token stats via the one-pass native expression
    * (graft.functions.TokenStats) — same integers as the declarative
    * HOF form, ~20× less per-token interpretation overhead. */
  private def docsWithStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(spark)
    Tables.documents(spark, dir).withColumn("TS", expr("token_stats(text)"))
  }

  /** Token counting: total / distinct / cumulative length (a whitespace
    * + regex "BPE-ish" proxy for token-budget accounting). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    docsWithStats(spark, dir).select(
      col("doc_id"),
      col("TS.NTokens").as("NTokens"),
      col("TS.NDistinct").as("NDistinct"),
      col("TS.SumTokenLen").as("SumTokenLen"))
      .withColumn("AvgTokenLen",
        col("SumTokenLen").cast(DoubleType) / col("NTokens"))
      .orderBy(col("doc_id"))

  /** Quality scoring from length / stopword-ratio signals — every score
    * a deterministic function of integer counts. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    docsWithStats(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("NChars"),
      col("TS.NTokens").as("NTokens"),
      col("TS.StopCount").as("StopCount"),
      col("TS.MaxTokenLen").as("MaxTokenLen"))
      .withColumn("StopRatio", col("StopCount").cast(DoubleType) / col("NTokens"))
      .withColumn("QualityScore", qualityScoreCol(col("NTokens"), col("StopCount")))
      .orderBy(col("doc_id"))

  /** N-gram-marker language-ID heuristic: count hits against per-lang
    * marker lists, argmax with a fixed preference order for ties. */
  def langid(spark: SparkSession, dir: String): DataFrame =
    docsWithStats(spark, dir)
      .select(col("doc_id"), col("lang"),
        col("TS.CEn").as("CEn"), col("TS.CEs").as("CEs"),
        col("TS.CDe").as("CDe"), col("TS.CFr").as("CFr"))
      .withColumn("Predicted",
        predictedLangCol(col("CEn"), col("CEs"), col("CDe"), col("CFr")))
      .select(col("doc_id"), col("CEn"), col("CEs"), col("CDe"), col("CFr"),
        col("Predicted"), col("lang").as("ActualLang"),
        (col("Predicted") === col("lang")).as("IsMatch"))
      .orderBy(col("doc_id"))

  /** Content fingerprints: an order-insensitive set fingerprint (md5 of
    * the sorted distinct token set) and a min-hash (the 1-permutation
    * MinHash primitive). Both portable to any engine with md5. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(spark)
    Tables.documents(spark, dir)
      // single-file input = ONE partition; the per-token md5 work is
      // the one text pass heavy enough to merit the narrow spread
      // (same reasoning as DedupOps.docShingles — at real scale the
      // input is already many splits)
      .repartition(col("doc_id"))
      .withColumn("TF", expr("token_fingerprint(text)"))
      .select(
        col("doc_id"),
        col("TF.Fingerprint").as("Fingerprint"),
        col("TF.MinTokenHash").as("MinTokenHash"),
        col("TF.NShingles").as("NShingles"))
      .orderBy(col("doc_id"))
  }
}
