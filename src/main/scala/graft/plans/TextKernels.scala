package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling kernel — the distinct 3-word-shingle set of a document
  * in one JVM pass. Replaces
  * `array_distinct(transform(sequence(1, greatest(n-2, 1)),
  *   i => array_join(slice(toks, i, 3), " ")))`
  * whose per-shingle lambda is evaluated INTERPRETED by Catalyst's
  * HigherOrderFunction machinery — and which the self-join-shaped dedup
  * pipelines re-evaluate once per join side. Output is element-for-element
  * identical (token split on a single space keeping trailing empties,
  * shingles in first-occurrence order, the `max(n-2, 1)` window count), so
  * every DuckDB oracle downstream of a shingle set still hash-matches.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.shingles($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Native 60-bit SimHash over a shingle set. Replaces a 60-wide stack of
  * interpreted `aggregate` lambdas (one per bit, each walking every
  * shingle hash) that dominated `dedup_simhash` runtime — the hash loop
  * now runs once per shingle, updating all 60 bit counters in one JVM
  * pass. Bit-identical to the expression tree it replaces: per shingle,
  * h = the first 15 md5 hex digits as a 60-bit integer (TextOps
  * .tokenHash60's `conv(substring(md5(t),1,15),16,10)`); per bit, +1 if
  * set else -1 summed across shingles; the sign vector packs into one
  * BIGINT with bit b weighted 2^b. Empty input → 0L, as the fold it
  * replaces produced.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.simhash60($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object TextKernels {

  /** Distinct 3-word shingles in first-occurrence order — exact
    * `array_distinct` semantics over the `max(n-2, 1)` sliding windows
    * (short documents yield their whole text as the single shingle,
    * windows past the end truncate, matching 1-based `slice`).
    */
  def shingles(text: UTF8String): GenericArrayData = {
    // limit -1 keeps trailing empty tokens — Spark's `split(str, " ")`
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var i = 0
    while (i < m) {
      val end = math.min(i + 3, n)
      val sb = new java.lang.StringBuilder(32)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** One-pass 60-bit SimHash: md5 per shingle, all 60 bit counters updated
    * in the same loop, minima-free and allocation-light (one digest buffer
    * and one counter array per call).
    */
  def simhash60(shingles: ArrayData): Long = {
    val n = shingles.numElements()
    val md = MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16)
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(shingles.getUTF8String(i).getBytes)
      md.digest(digest, 0, 16)
      // first 15 hex digits big-endian = bytes 0..6 plus the high nibble
      // of byte 7 — exactly conv(substring(md5hex, 1, 15), 16, 10)
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h = (h << 4) | ((digest(7) >> 4) & 0xfL)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Idempotent per-session registration, same pattern as
    * [[VectorFunctions.register]].
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_set", exprs => ShingleSet(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
  }

  def shingleSet(text: Column): Column = call_function("shingle_set", text)
  def simhashSig(shingles: Column): Column = call_function("simhash60", shingles)
}
