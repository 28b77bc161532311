package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force top-k cosine as the exact baseline and
  * random-hyperplane (sign) LSH as the scale path.
  *
  * == Determinism ==
  * Embedding floats are quantized to exact integers (round(x·10⁴)) so
  * dot products and squared norms are exact 64-bit integer sums —
  * identical regardless of summation order, partitioning, or engine.
  * Cosines are then single IEEE divisions of exact inputs. This removes
  * the classic float-reduction nondeterminism that would break oracle
  * hash-matching (and, at scale, run-to-run reproducibility).
  *
  * == Scale ==
  * Brute force is O(probes × n) — fine for a bounded probe set, linear
  * shuffle-free map + top-k (TakeOrdered-style via ranking window per
  * probe). The LSH variant sketches every vector to an 8-bit signature
  * per band (one narrow pass) and self-joins per band on the signature:
  * candidate pairs ≈ n²/2⁸ per band instead of n², and the join key is
  * hash-uniform. An IVF refinement (k-means centroids as partitions)
  * would slot into the same candidate-generation seam.
  */
object SimilarityOps {

  /** vec_id, label, quantized int vector Q, exact squared norm NormSq. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 10000.0) as bigint))").as("Q"))
      .withColumn("NormSq",
        expr("aggregate(transform(Q, x -> x * x), cast(0 as bigint), (a, x) -> a + x)"))

  /** Deterministic pseudo-random hyperplane sign for (plane p, dim i):
    * +1 iff hex digit p of md5(i) ≥ 8. Mirrors the oracle exactly. */
  private def projBitSql(p: Int): String =
    s"""CASE WHEN aggregate(transform(sequence(1, size(Q)),
       |  i -> CASE WHEN instr('0123456789abcdef', substring(md5(cast(i as string)), $p, 1)) - 1 >= 8
       |            THEN element_at(Q, i) ELSE -element_at(Q, i) END),
       |  cast(0 as bigint), (a, x) -> a + x) >= 0 THEN '1' ELSE '0' END""".stripMargin

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("Bucket", concat((1 to 8).map(p => expr(projBitSql(p))): _*))

  /** Exact brute-force top-5 cosine neighbors for probe vectors
    * (vec_id < 8). */
  def topk(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val all = quantized(spark, dir)
    val probes = all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("QId"), col("Q").as("QP"), col("NormSq").as("NormP"))
    val pairs = probes.crossJoin(all).filter(col("vec_id") =!= col("QId"))
      .withColumn("Dot",
        expr("aggregate(zip_with(QP, Q, (x, y) -> x * y), cast(0 as bigint), (a, x) -> a + x)"))
      .withColumn("Cosine",
        col("Dot").cast(DoubleType) /
          (sqrt(col("NormP").cast(DoubleType)) * sqrt(col("NormSq").cast(DoubleType))))
    pairs
      .withColumn("Rank", row_number().over(
        Window.partitionBy(col("QId")).orderBy(col("Cosine").desc, col("vec_id"))))
      .filter(col("Rank") <= k)
      .select(col("QId"), col("vec_id").as("NId"), col("Cosine"), col("Rank"))
      .orderBy(col("QId"), col("Rank"))
  }

  /** Embedding near-dup pairs via sign-LSH candidates (8-bit bucket)
    * verified with exact cosine ≥ 0.3. */
  def lshNeardup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val sig = withBucket(quantized(spark, dir))
    val a = sig.select(col("vec_id").as("V1"), col("label").as("L1"),
      col("Q").as("Q1"), col("NormSq").as("N1"), col("Bucket"))
    val b = sig.select(col("vec_id").as("V2"), col("label").as("L2"),
      col("Q").as("Q2"), col("NormSq").as("N2"), col("Bucket").as("Bucket2"))
    a.join(b, col("Bucket") === col("Bucket2") && col("V1") < col("V2"))
      .withColumn("Dot",
        expr("aggregate(zip_with(Q1, Q2, (x, y) -> x * y), cast(0 as bigint), (a, x) -> a + x)"))
      .withColumn("Cosine",
        col("Dot").cast(DoubleType) /
          (sqrt(col("N1").cast(DoubleType)) * sqrt(col("N2").cast(DoubleType))))
      .filter(col("Cosine") >= threshold)
      .select(col("V1"), col("V2"), col("Cosine"), (col("L1") === col("L2")).as("SameLabel"))
      .orderBy(col("V1"), col("V2"))
  }
}
