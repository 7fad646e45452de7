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
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared interpreted/codegen kernel: one pass per seed over the
    * shingle bytes, thread-local MessageDigest, no Catalyst per-element
    * dispatch.
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
    var p = 0
    while (p < seeds) {
      val prefix = (p.toString + "|").getBytes(StandardCharsets.UTF_8)
      var minLo: String = null
      var minHi: String = null
      i = 0
      while (i < n) {
        md.reset()
        md.update(prefix)
        md.update(shingleBytes(i))
        val d = md.digest()
        val hex = new Array[Char](32)
        var j = 0
        while (j < 16) {
          hex(j * 2) = hexDigits((d(j) >> 4) & 0xf)
          hex(j * 2 + 1) = hexDigits(d(j) & 0xf)
          j += 1
        }
        val lo = new String(hex, 0, 16)
        val hi = new String(hex, 16, 16)
        if (minLo == null || lo.compareTo(minLo) < 0) minLo = lo
        if (minHi == null || hi.compareTo(minHi) < 0) minHi = hi
        i += 1
      }
      out(p * 2) = UTF8String.fromString(minLo)
      out(p * 2 + 1) = UTF8String.fromString(minHi)
      p += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")

  def minhashSig(shingles: Column): Column = call_function("minhash_sig", shingles)
}
