package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Native argmin of squared-L2 distance: `left` is one array<long>
  * vector, `right` an array<array<long>> codebook; the result is the
  * 0-based index of the nearest centroid, FIRST index on ties — exactly
  * the `array_position(dists, array_min(dists)) - 1` expression nest it
  * replaces in the k-means assign (integer arithmetic, so bit-identical
  * and every kmeans-family oracle is unaffected). One fused JVM loop
  * instead of k interpreted `aggregate(zip_with(...))` lambdas per row —
  * the same interpreted-HOF-stack remedy as MinHashSig/SimHash60, applied
  * to the quantized-vector hot path (k-means assign runs once per corpus
  * row per Lloyd round).
  *
  * Null semantics: null inputs → null; empty codebook → null; a centroid
  * whose length differs from the vector → null (surfaces an upstream
  * dimensionality bug instead of scoring a prefix).
  */
case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"argmin_l2 requires (array<bigint>, array<array<bigint>>), got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = ArgMinL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("argmin")
      s"""
         |int $r = graft.plans.ArgMinL2.compute($a, $b);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinL2 =
    copy(left = newLeft, right = newRight)
}

object ArgMinL2 {
  /** Shared interpreted/codegen kernel. Returns -1 for "null" (empty
    * codebook or a dimensionality mismatch). Strict `<` keeps the FIRST
    * index on distance ties — the deterministic tie-break the oracles
    * encode.
    */
  def compute(x: ArrayData, cents: ArrayData): Int = {
    val n = x.numElements()
    val k = cents.numElements()
    if (k == 0) return -1
    var best = -1
    var bestD = Long.MaxValue
    var j = 0
    while (j < k) {
      val cv = cents.getArray(j)
      if (cv.numElements() != n) return -1
      var d = 0L
      var i = 0
      while (i < n) {
        val t = x.getLong(i) - cv.getLong(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }
}

object VectorFunctions {
  /** Idempotent per-session registration (for sessions built without the
    * extensions config — Verify/Bench/tests).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_l2", exprs => ArgMinL2(exprs(0), exprs(1)), "built-in")
  }

  /** Codegen'd dot product column; callers must `register` the session
    * first (idempotent, cheap).
    */
  def vectorDot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  /** Codegen'd nearest-centroid index; callers must `register` first. */
  def argminL2(x: Column, cents: Column): Column = call_function("argmin_l2", x, cents)
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
    ext.injectFunction((
      FunctionIdentifier("argmin_l2"),
      new ExpressionInfo(classOf[ArgMinL2].getName, "argmin_l2"),
      exprs => ArgMinL2(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
