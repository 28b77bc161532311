package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.ops.SimilarityOps

/** Dir-level invalidation of the corpus row-count memos (r15 — the
  * r14 advice gap): appending to a corpus dir must be observable, via
  * ONE entry point, by both the documents spread width and the
  * embeddings count that sizes the similarity family's exchanges. */
class CorpusMemoSpec extends SparkSpec {

  test("invalidateCorpusCounts refreshes the documents spread width and the embeddings count after an append") {
    val dir = Files.createTempDirectory("graft_memo_").toString
    // 100 docs → ceil(100/160) = 1 partition at local[4]
    val doc = (n: Long) => spark.range(n)
      .select(col("id").as("doc_id"),
        concat(lit("body of document "), col("id")).as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        (length(col("id").cast("string")) + 17L).as("n_chars"))
    doc(100L).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = (from: Long, n: Long) => spark.range(from, from + n)
      .select(col("id").as("vec_id"),
        array(col("id").cast("float"), lit(1.0f)).as("embedding"),
        lit(0).as("label"))
    emb(0L, 100L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    assert(Tables.documentsSpread(spark, dir).rdd.getNumPartitions === 1)
    assert(SimilarityOps.embeddingsCount(spark, dir) === 100L)

    // append 900 more rows to each table IN PLACE
    doc(900L).withColumn("doc_id", col("doc_id") + 1000L)
      .write.mode("append").parquet(s"$dir/documents.parquet")
    emb(1000L, 900L).write.mode("append").parquet(s"$dir/embeddings.parquet")

    // the memos are deliberately sticky — stale until invalidated
    // (this is the failure mode the entry point exists to close)
    assert(Tables.documentsSpread(spark, dir).rdd.getNumPartitions === 1)
    assert(SimilarityOps.embeddingsCount(spark, dir) === 100L)

    Tables.invalidateCorpusCounts(spark, dir)

    // 1000 docs → min(defaultParallelism = 4, ceil(1000/160) = 7) = 4
    assert(Tables.documentsSpread(spark, dir).rdd.getNumPartitions === 4)
    assert(SimilarityOps.embeddingsCount(spark, dir) === 1000L)
  }
}
