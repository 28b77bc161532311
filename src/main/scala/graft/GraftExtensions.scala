package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Library installer: registers every graft native function on any
  * session via the standard extensions mechanism —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or, on a builder (GraftSession.builder() in this repo):
  *   builder.withExtensions(new GraftExtensions) ...
  * }}}
  *
  * This is the supported way to ship custom Catalyst expressions with
  * a library (functions become available in SQL text and `expr()` on
  * every session of the cluster, including thrift/connect sessions,
  * with no per-session `register` call). The per-module
  * `register(spark)` helpers remain for ad-hoc/local use; both paths
  * bind the same constructors, and injected functions land in the
  * session's registry so either registration order is idempotent. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("long_dot", "exact integer dot product of two bigint arrays",
      es => LongDotProduct(es(0), es(1))),
    ("quantize_vec", "float array -> round(x*10^4) bigint array",
      es => QuantizeVector(es.head)),
    ("token_stats", "one-pass token statistics struct over text",
      es => TokenStats(es.head)),
    ("token_fingerprint", "md5 set-fingerprint / min-hash struct over text",
      es => TokenFingerprint(es.head)),
    ("token_shingles", "distinct 3-gram token shingles of text",
      es => TokenShingles(es.head)),
    ("minhash_bands", "MinHash-8 LSH band values of a shingle array",
      es => MinhashBands(es.head)),
    ("simhash_bits", "8-bit SimHash bit string of text",
      es => SimhashBits(es.head)),
    ("zorder_long", "Morton (Z-order) interleave of normalized bigint dims",
      es => ZOrderLong(es.head)),
    ("rolling_chunks", "md5s of content-defined (rolling-hash) chunks of text",
      es => RollingChunks(es.head)),
    ("misra_gries", "mergeable Misra-Gries frequent-items summary (col, k)",
      es => MisraGriesTopK(es(0), SketchAggregates.intLit(es(1), "misra_gries(col, k)"))),
    ("bloom_build", "Bloom-filter bitset over bigint keys (col, log2Bits)",
      es => BloomBuildAgg(es(0), SketchAggregates.intLit(es(1), "bloom_build(col, log2Bits)"))),
    ("bloom_contains", "membership probe against a bloom_build bitset",
      es => BloomMightContain(es(0), es(1))),
    ("kmv_kmin", "k smallest distinct bigints — KMV bottom-k sketch (col, k)",
      es => KMinValues(es(0), SketchAggregates.intLit(es(1), "kmv_kmin(col, k)"))),
    ("topk_edges", "k best (id, score) pairs of a group, best-first (id, score, k)",
      es => TopKEdges(es(0), es(1), SketchAggregates.intLit(es(2), "topk_edges(id, score, k)"))),
    ("label_argmax", "most frequent label, ties to the lowest (LPA vote)",
      es => LabelArgmax(es.head)),
    ("ahash_bands", "4 band ints of the 64-bit average perceptual hash of text",
      es => AhashBands(es.head)),
    ("phash_bands", "4 band ints of the 64-bit DCT perceptual hash of text",
      es => PhashBands(es.head)),
    ("audiofp_bands", "4 band ints of the energy-delta audio fingerprint of text",
      es => AudioFpBands(es.head)))

  /** Every function name this installer injects — the parity contract
    * the per-module register() path (Verify.registerAll) is tested
    * against, so a function added to one path can't silently go
    * missing from the other. */
  private[graft] def functionNames: Seq[String] = functions.map(_._1)

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
