package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling + MinHash expressions for the dedup pipeline.
  *
  * The declarative forms (`transform(sequence(1, size-2), i ->
  * concat(element_at(...)))` and `array_min(transform(sh, md5(...)))`)
  * are interpreted per element — at sf0.1 that is ~15M `element_at`
  * calls for shingling and ~120M md5 lambda dispatches for 8 MinHash
  * functions, and the whole thing landed in ONE task (334 s) when the
  * planner put it on a join build side. These compute identical values
  * (validated against the DuckDB oracle) one document at a time in
  * plain JVM loops.
  */
object ShingleExpressions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("token_shingles",
      exprs => TokenShingles(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_bands",
      exprs => MinhashBands(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash_bits",
      exprs => SimhashBits(exprs.head), "built-in")
  }
}

/** text → 8-char SimHash bit string, one md5 PER DISTINCT TOKEN with
  * all 8 hex positions read from that single digest — replaces the 8
  * interpreted `aggregate(transform(...))` HOF lambdas that re-hashed
  * every token once per position (8× the md5 work, per-element
  * interpreted dispatch). Bit p is set iff the mean of hex digit p over
  * distinct tokens is ≥ 7.5, computed in integers as
  * 2·sum ≥ 15·count — byte-identical to the declarative form and the
  * DuckDB oracle (ExtSql.dedupSimhash). */
case class SimhashBits(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokenize(input.asInstanceOf[UTF8String].toString)
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → distinct 3-gram token shingles (first-occurrence order,
  * exactly like `array_distinct(transform(...))` over
  * `split(trim(text), '\s+')`). */
case class TokenShingles(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokenize(input.asInstanceOf[UTF8String].toString)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingles → the 4 LSH band values: band b = md5(mh(2b-1) || mh(2b))
  * where mh(j) = min over shingles of md5("j|" + shingle). Identical
  * strings to the declarative/oracle formulation. */
case class MinhashBands(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private val NumHashes = 8

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val mins = new Array[String](NumHashes)
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i).toString
      var j = 0
      while (j < NumHashes) {
        val h = TextExpressions.md5Hex((j + 1).toString + "|" + s)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    val bands = new Array[Any](NumHashes / 2)
    var b = 0
    while (b < NumHashes / 2) {
      bands(b) =
        if (mins(2 * b) == null) null
        else UTF8String.fromString(TextExpressions.md5Hex(mins(2 * b) + mins(2 * b + 1)))
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
