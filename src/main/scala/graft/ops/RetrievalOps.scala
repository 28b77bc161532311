package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** HYBRID RETRIEVAL — reciprocal-rank fusion of the lexical (BM25)
  * and embedding (exact cosine top-k) ranked lists, the canonical
  * two-tower retrieval composition a training-data pipeline runs for
  * eval-set mining and hard-negative sourcing once both substrates
  * exist. The reference's pipeline has no retrieval stage at all
  * (ref: etl.py stops at aggregation); this operator composes two
  * engine substrates that each already mirror to the oracle.
  *
  * Fusion is RRF (Cormack, Clarke & Buettcher, SIGIR 2009):
  * `score(d) = Σ_lists 1/(K + rank_list(d))` with the standard
  * K = [[RrfK]] = 60, summed over the lists that retrieved `d` (a
  * list that missed `d` contributes 0 — the published convention).
  * Rank arithmetic is exact-rational over INTEGER ranks: each term is
  * one exactly-rounded IEEE division of small integers and the final
  * score one addition of two such doubles, so the DuckDB oracle —
  * which nests the two branch mirrors verbatim as CTEs — reproduces
  * every score bit-for-bit (the house determinism playbook; no libm).
  *
  * Query identity: the engine's retrieval workload is
  * [[TextOps.Bm25Queries]]; query `q`'s embedding-side exemplar is
  * probe vector `vec_id = q` (the corpus ships no query encoder — the
  * piiRedact planted-workload pattern), and the fused doc space rides
  * the corpus's 1:1 doc_id ↔ vec_id alignment. Probe ids are checked
  * against [[SimilarityOps.ProbeIdMax]] so the vector branch really
  * contains every query's list.
  *
  * Scale shape: both branches end in bounded per-query top-k
  * (WindowGroupLimit — never a global sort), so the fusion join's
  * inputs are |queries|·k rows EACH regardless of corpus size; the
  * full-outer equi-join on (QueryId, doc_id) and the per-query
  * row_number are driver-trivial at any corpus scale. All the heavy
  * lifting stays inside the two substrates, which keep their own
  * 100 TB shapes (BM25: hit-sized tf pass; cosine: bounded-probe
  * scan). */
object RetrievalOps {

  /** RRF smoothing constant (the SIGIR 2009 default). */
  val RrfK = 60
  /** Fused results reported per query. */
  val RrfTopK = 10

  /** Fused ranking per query: lexical rank, vector rank (null where a
    * branch missed the doc), exact-rational RRF score, fused rank. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val qids = TextOps.Bm25Queries.map(_._1)
    require(qids.forall(q => q >= 0 && q < SimilarityOps.ProbeIdMax),
      s"every BM25 query id must have a probe vector (vec_id < ${SimilarityOps.ProbeIdMax})")
    val lex = TextOps.bm25Topk(spark, dir)
      .select(col("QueryId"), col("doc_id"), col("Rank").as("LexRank"))
    val vec = SimilarityOps.topk(spark, dir)
      .filter(col("QId").isInCollection(qids.map(_.toLong)))
      .select(col("QId").cast(IntegerType).as("QueryId"),
        col("NId").as("doc_id"), col("Rank").as("VecRank"))
    val w = Window.partitionBy(col("QueryId"))
      .orderBy(col("RrfScore").desc, col("doc_id"))
    lex.join(vec, Seq("QueryId", "doc_id"), "full_outer")
      .withColumn("RrfScore",
        coalesce(lit(1.0) / (lit(RrfK) + col("LexRank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("VecRank")), lit(0.0)))
      .withColumn("Rank", row_number().over(w))
      .filter(col("Rank") <= RrfTopK)
      .select(col("QueryId"), col("doc_id"), col("LexRank"), col("VecRank"),
        col("RrfScore"), col("Rank"))
      .orderBy(col("QueryId"), col("Rank"))
  }
}
