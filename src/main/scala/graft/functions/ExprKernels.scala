package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TextOps

/** Per-row compute kernels shared by the native expressions' two
  * evaluation paths: `nullSafeEval` (interpreted) calls them directly,
  * and `doGenCode` emits a static call to the same method — a Scala
  * object with no companion class compiles to static forwarders, so
  * generated Java invokes `graft.functions.ExprKernels.x(...)` with no
  * reflection and no reference-array indirection.
  *
  * This is what moves the sketch expressions from `CodegenFallback` to
  * real codegen: CollapseCodegenStages refuses whole-stage codegen for
  * ANY operator whose expressions contain a CodegenFallback, so the
  * old fallbacks didn't just cost an interpreted call per row — they
  * pushed the entire containing Project/Filter out of
  * WholeStageCodegen (volcano iteration, row boxing, no fused
  * pipeline). With a real doGenCode the operator stays fused; the
  * kernel itself is the same one-primitive-loop-per-row either way.
  * ExtensionsSpec executes every kernel with
  * `spark.sql.codegen.fallback=false`, so a generated-code compile
  * error fails tests instead of silently degrading to interpreted.
  */
object ExprKernels {

  /** array<float> → array<bigint> of round(x·10⁴) ([[QuantizeVector]]). */
  def quantize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = VectorExpressions.roundHalfUp(x.getFloat(i).toDouble * 10000.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** text → 8-char SimHash bit string ([[SimhashBits]]). */
  def simhashBits(input: UTF8String): UTF8String = {
    val toks = TextExpressions.tokenize(input.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val sums = new Array[Long](8)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = TextExpressions.md5Hex(toks(i))
        var p = 0
        while (p < 8) { sums(p) += Character.digit(h.charAt(p), 16); p += 1 }
        n += 1
      }
      i += 1
    }
    val bits = new Array[Char](8)
    var p = 0
    while (p < 8) { bits(p) = if (2L * sums(p) >= 15L * n) '1' else '0'; p += 1 }
    UTF8String.fromString(new String(bits))
  }

  /** text → distinct 3-gram token shingles, first-occurrence order
    * ([[TokenShingles]]). */
  def tokenShingles(input: UTF8String): ArrayData = tokenShingles(input, 3)

  /** Generalized n-token window (round 8): decontamination runs at
    * wider windows (published practice is 8-13 grams; trigrams
    * over-flag — common phrases collide across unrelated documents)
    * while the dedup family stays at 3. n=3 output is byte-identical
    * to the original fixed-width loop. */
  def tokenShingles(input: UTF8String, n: Int): ArrayData = {
    val toks = TextExpressions.tokenize(input.toString)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n - 1 < toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  private val MinhashFns = 8

  /** shingles → 4 LSH band values ([[MinhashBands]]). */
  def minhashBands(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[String](MinhashFns)
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i).toString
      var j = 0
      while (j < MinhashFns) {
        val h = TextExpressions.md5Hex((j + 1).toString + "|" + s)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    val bands = new Array[Any](MinhashFns / 2)
    var b = 0
    while (b < MinhashFns / 2) {
      bands(b) =
        if (mins(2 * b) == null) null
        else UTF8String.fromString(TextExpressions.md5Hex(mins(2 * b) + mins(2 * b + 1)))
      b += 1
    }
    new GenericArrayData(bands)
  }

  private val stopSet = TextOps.stopwords.toSet
  private val markerSets: Array[Set[String]] =
    TextOps.langMarkers.map(_._2.toSet).toArray

  /** text → one-pass token statistics row ([[TokenStats]]). */
  def tokenStats(input: UTF8String): InternalRow = {
    val toks = TextExpressions.tokenize(input.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var sumLen = 0L
    var maxLen = 0
    var stop = 0
    val markerHits = new Array[Int](markerSets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.length
      if (t.length > maxLen) maxLen = t.length
      if (stopSet.contains(t)) stop += 1
      var m = 0
      while (m < markerSets.length) {
        if (markerSets(m).contains(t)) markerHits(m) += 1
        m += 1
      }
      seen.add(t)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length, seen.size(), sumLen, maxLen, stop,
      markerHits(0), markerHits(1), markerHits(2), markerHits(3)))
  }

  /** array<bigint> of normalized per-dimension values → Morton
    * (Z-order) code ([[ZOrderLong]]): bit b of dimension j lands at
    * result bit `b·n + j`, so the low bits of every dimension
    * interleave — points close in ALL dimensions get close codes.
    * Each dimension contributes `63 / n` bits (31 for 2 dims, 21 for
    * 3, 15 for 4); callers normalize values into that range. Null
    * elements count as 0 (they sort to the curve's origin). */
  def zorder(x: ArrayData): Long = {
    val n = x.numElements()
    // SQL-reachable (zorder_long is a registered function), so the
    // arity is a runtime property: an empty array would divide by
    // zero below, and 64+ dims would yield bits = 0 — every row
    // mapping to z = 0, a silently degenerate clustering key
    if (n == 0) return 0L
    if (n > 63) throw new IllegalArgumentException(
      s"zorder_long supports 1..63 dimensions, got $n")
    val bits = 63 / n
    var z = 0L
    var j = 0
    while (j < n) {
      val v = if (x.isNullAt(j)) 0L else x.getLong(j)
      var b = 0
      while (b < bits) {
        z |= ((v >> b) & 1L) << (b * n + j)
        b += 1
      }
      j += 1
    }
    z
  }

  private val chunkPows: Array[Long] = TextOps.ChunkPows.toArray

  /** text → md5 of each content-defined chunk, in order, duplicates
    * kept ([[RollingChunks]]). Operates on CODEPOINTS — DuckDB's
    * `substr`/`length`/`unicode` are codepoint-based, and the mirror
    * must cut at identical offsets for astral-plane text too. One
    * bounded inner loop per position (W=8); the windowed hash is
    * recomputed rather than rolled — branch-free and already
    * memory-bound at this W. */
  def rollingChunks(input: UTF8String): ArrayData = {
    val s = input.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val W = TextOps.ChunkWindow
    val M = TextOps.ChunkMod
    val D = TextOps.ChunkDivisor
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i <= n - W) {
      var h = 0L
      var j = 0
      while (j < W) { h = (h + cps(i + j).toLong * chunkPows(j)) % M; j += 1 }
      if (h % D == 0) cuts += (i + W)
      i += 1
    }
    if (cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length - 1)
    var k = 0
    while (k < out.length) {
      val (a, b) = (cuts(k), cuts(k + 1))
      out(k) = UTF8String.fromString(
        TextExpressions.md5Hex(new String(cps, a, b - a)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** text → one-pass content-hash row ([[TokenFingerprint]]). */
  def tokenFingerprint(input: UTF8String): InternalRow = {
    val toks = TextExpressions.tokenize(input.toString)
    // Fingerprint: md5 of sorted distinct tokens joined by ' '
    // (ASCII ⇒ String ordering == UTF8 byte ordering used by array_sort)
    val distinct = toks.distinct.sorted
    val fp = TextExpressions.md5Hex(distinct.mkString(" "))
    var minHash: String = null
    var i = 0
    while (i < toks.length) {
      val h = TextExpressions.md5Hex(toks(i))
      if (minHash == null || h.compareTo(minHash) < 0) minHash = h
      i += 1
    }
    val sh = new java.util.HashSet[String]()
    i = 0
    while (i + 2 < toks.length) {
      sh.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fp),
      if (minHash == null) null else UTF8String.fromString(minHash),
      sh.size()))
  }

  // ---------- perceptual-hash byte-twin kernels (MultimodalOps) ----------

  /** `k` evenly-spaced codepoint samples of the text — exactly
    * `ascii(substr(text, CAST((CAST(i AS BIGINT) * length(text)) div k
    * AS INT) + 1, 1))` for i in 0..k−1: Spark's `length`/`substr` are
    * codepoint-based and `Ascii` is `codePointAt(0)` (verified against
    * the 4.1.2 bytecode), so the sample is the ((i·n) div k)-th
    * codepoint; empty text samples 0 (ascii('') = 0). The position
    * multiply is widened to long first (the same overflow note as the
    * SQL forms: docs past ~34M chars would overflow i·n in 32 bits). */
  private def sampleCps(input: UTF8String, k: Int): Array[Int] = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    val out = new Array[Int](k)
    if (n > 0) {
      var i = 0
      while (i < k) { out(i) = cps(((i.toLong * n) / k).toInt); i += 1 }
    }
    out
  }

  /** Shared band packer: bit j of band b is set iff `test(16·b + j)`
    * holds AND the bit index 16·b+j stays inside `nBits` (aHash uses
    * all 64; pHash/audio carry 63 — band 3 is 15 bits, so no shift
    * ever reaches a sign bit, the DuckDB-parity band layout). */
  private def packBands(nBits: Int)(test: Int => Boolean): ArrayData = {
    val bands = new Array[Int](4)
    var b = 0
    while (b < 4) {
      var w = 0
      var j = 0
      while (j < 16) {
        val idx = 16 * b + j
        if (idx < nBits && test(idx)) w |= 1 << j
        j += 1
      }
      bands(b) = w
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** text → the 4 aHash bands ([[graft.ops.MultimodalOps.ahashNeardup]]):
    * 64 samples, integer mean (floor — the SQL `div 64` on a
    * non-negative sum), bit i = sample_i > mean. */
  def ahashBands(input: UTF8String): ArrayData = {
    val s = sampleCps(input, 64)
    var sum = 0
    var i = 0
    while (i < 64) { sum += s(i); i += 1 }
    val m = sum / 64
    packBands(64)(i => s(i) > m)
  }

  /** text → the 4 pHash bands: integer 8×8 DCT-II of the 64 samples
    * over the driver-rounded [[graft.ops.MultimodalOps.PhashDctBasis]]
    * literals (T[k] ≤ 2⁴² — long-exact), 63 AC coefficients
    * thresholded against their exact median (the 32nd order statistic
    * of the sorted 63). Bit i (0-based) = T[i+1] > med. */
  def phashBands(input: UTF8String): ArrayData = {
    val s = sampleCps(input, 64)
    val basis = graft.ops.MultimodalOps.PhashDctBasisArr
    val t = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val u = (k >> 3) << 3
      val v = (k & 7) << 3
      var acc = 0L
      var m = 0
      while (m < 64) {
        acc += basis(u + (m >> 3)) * basis(v + (m & 7)) * s(m)
        m += 1
      }
      t(k) = acc
      k += 1
    }
    val ac = java.util.Arrays.copyOfRange(t, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    packBands(63)(i => t(i + 1) > med)
  }

  /** text → the 4 audio-fingerprint bands: 256 samples → 64 frames of
    * 4 → frame energies E_f = Σ s² → bit f = E_{f+1} > E_f.
    *
    * Energies accumulate in LONG — a deliberate strengthening over
    * the retired int-typed HOF form, which under Spark 4's default
    * ANSI mode THREW on any sampled codepoint past ~23k (4·28450²
    * overflows int32 — CJK text crashed the old query; found by the
    * MultimodalSpec edge-case parity test). Identical values wherever
    * the old form evaluated at all (4·2¹⁶ < 2³¹ covers every real
    * PCM byte and the BMP's alphabetic planes); the DuckDB mirror is
    * widened the same way. */
  def audioFpBands(input: UTF8String): ArrayData = {
    val s = sampleCps(input, 256)
    val e = new Array[Long](64)
    var f = 0
    while (f < 64) {
      var acc = 0L
      var j = 0
      while (j < 4) { val x = s(4 * f + j).toLong; acc += x * x; j += 1 }
      e(f) = acc
      f += 1
    }
    packBands(63)(i => e(i + 1) > e(i))
  }

  /** Set the 4 double-hashed Bloom bits for `key` in a long-packed
    * bitset whose length is a power of two ([[SketchAggregates]]). */
  def bloomSet(bits: Array[Long], key: Long): Unit = {
    val mask = (bits.length.toLong << 6) - 1
    val h1 = SketchAggregates.mix64(key)
    val h2 = SketchAggregates.mix64(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < SketchAggregates.NumHashes) {
      val bit = (h1 + i.toLong * h2) & mask
      bits((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe the same 4 bits against a LITTLE_ENDIAN byte image of the
    * bitset (the BINARY produced by `bloom_build`) — byte-addressed so
    * the codegen path probes the broadcast bytes with no copy. */
  def bloomContains(bytes: Array[Byte], key: Long): Boolean = {
    val mask = (bytes.length.toLong << 3) - 1
    val h1 = SketchAggregates.mix64(key)
    val h2 = SketchAggregates.mix64(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < SketchAggregates.NumHashes) {
      val bit = (h1 + i.toLong * h2) & mask
      if ((bytes((bit >>> 3).toInt) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}
