package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) dot product over two ArrayType(DoubleType) columns —
  * the SURVEY §7 Phase-6 perf move: a Catalyst `Expression` with
  * `doGenCode` replaces the interpreted higher-order
  * `aggregate(zip_with(...))` chain in the similarity hot path. The
  * generated loop reads the unsafe array data directly — no per-element
  * lambda dispatch, no boxing, fused into the surrounding whole-stage
  * codegen.
  *
  * Summation is in index order, exactly like the left-fold it replaces, so
  * results are bit-identical and every existing DuckDB oracle still
  * hash-matches.
  *
  * Null semantics: null array → null result (BinaryExpression nullSafe);
  * LENGTH-MISMATCHED arrays → null (a partial dot product over the common
  * prefix would silently mask an upstream embedding-length bug — surface
  * it as null instead, and let the caller decide to filter or fail);
  * null ELEMENTS are not supported (embedding vectors are dense) — keep
  * the input arrays element-non-null, as the testdata schema guarantees.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // null is also produced for length-mismatched (non-null) inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two array<double> inputs, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private val name = "vector_dot"
  private val builder: Seq[Expression] => Expression =
    exprs => VectorDot(exprs(0), exprs(1))

  /** Idempotent per-session registration (for sessions built without the
    * extensions config — Verify/Bench/tests).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Codegen'd dot product column; callers must `register` the session
    * first (idempotent, cheap).
    */
  def vectorDot(a: Column, b: Column): Column = call_function(name, a, b)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the native
  * function into every session at build time — the standard deployment
  * path for a library shipping Catalyst extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      exprs => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => MinHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      exprs => ShingleSet(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      exprs => SimHash60(exprs.head)))
  }
}
