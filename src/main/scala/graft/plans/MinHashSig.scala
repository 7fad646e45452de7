package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-value MinHash signature of a shingle set in ONE native loop —
  * replaces a 3-deep nest of interpreted HigherOrderFunctions (16 seeds ×
  * n shingles × md5 + 2 substring-mins) whose per-element Catalyst
  * evaluation dominated dedup_near's runtime.
  *
  * Semantics are EXACTLY the expression tree it replaces (and the DuckDB
  * oracle mirrors): for seed p in 0..15, digest = md5hex(p + "|" +
  * shingle); permutation 2p   = min over shingles of digest[0,16),
  * permutation 2p+1 = min over shingles of digest[16,32). md5 of the
  * UTF-8 bytes, lowercase hex — byte-identical to Spark's `md5` and
  * DuckDB's `md5`, which is what keeps the LSH pipeline oracle-checkable.
  *
  * Codegen emits a call to the same static kernel used by the interpreted
  * path: one implementation, no per-element virtual dispatch either way.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val seeds = 16
  private val hexDigits: Array[Byte] =
    "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(seeds)(p => (p.toString + "|").getBytes(StandardCharsets.UTF_8))

  /** Shared interpreted/codegen kernel: one pass per seed over the
    * shingle bytes, thread-local MessageDigest, no Catalyst per-element
    * dispatch.
    *
    * The inner loop is allocation-free: the lexicographic order of a
    * 16-hex-char digest half equals the unsigned numeric order of its 8
    * raw bytes read big-endian, so each per-permutation minimum is kept
    * as a primitive long and rendered to hex only once per seed after
    * the loop. (The earlier form allocated a digest array, a 32-char
    * hex buffer and two Strings per shingle×seed — millions of
    * short-lived objects per partition, whose GC cost was acutely
    * sensitive to heap geometry.)
    */
  def compute(shingles: ArrayData): GenericArrayData = {
    val n = shingles.numElements()
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](seeds * 2)
    val shingleBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      shingleBytes(i) = shingles.getUTF8String(i).getBytes
      i += 1
    }
    val digest = new Array[Byte](16)
    var p = 0
    while (p < seeds) {
      val prefix = prefixes(p)
      var minLo = 0L
      var minHi = 0L
      var any = false
      i = 0
      while (i < n) {
        md.reset()
        md.update(prefix)
        md.update(shingleBytes(i))
        md.digest(digest, 0, 16)
        var lo = 0L
        var hi = 0L
        var j = 0
        while (j < 8) {
          lo = (lo << 8) | (digest(j) & 0xffL)
          hi = (hi << 8) | (digest(j + 8) & 0xffL)
          j += 1
        }
        if (!any) { minLo = lo; minHi = hi; any = true }
        else {
          if (java.lang.Long.compareUnsigned(lo, minLo) < 0) minLo = lo
          if (java.lang.Long.compareUnsigned(hi, minHi) < 0) minHi = hi
        }
        i += 1
      }
      out(p * 2) = if (any) hexOf(minLo) else null
      out(p * 2 + 1) = if (any) hexOf(minHi) else null
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Lowercase 16-hex-char rendering of a long, nibbles most significant
    * first — byte-identical to the substring of Spark/DuckDB `md5` hex it
    * stands in for.
    */
  private def hexOf(v: Long): UTF8String = {
    val hex = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      hex(j) = hexDigits(((v >>> ((15 - j) * 4)) & 0xfL).toInt)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")

  def minhashSig(shingles: Column): Column = call_function("minhash_sig", shingles)
}
