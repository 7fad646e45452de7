package graft

import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions

/** The native codegen'd VectorDot must be bit-identical to the
  * higher-order fold it replaced (same index-order summation) — that
  * equivalence is what keeps every similarity oracle valid.
  */
class VectorDotSpec extends SparkTestBase {
  import spark.implicits._

  test("vector_dot equals aggregate(zip_with(...)) bit-for-bit") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = e.crossJoin(q).select(
      col("vec_id"),
      VectorFunctions.vectorDot(col("v"), col("qv")).as("native"),
      aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("ho"))
    assert(both.filter(col("native") =!= col("ho")).count() === 0)
  }

  test("vector_dot nulls: null array yields null, not a crash") {
    VectorFunctions.register(spark)
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (2L, None, Some(Array(3.0, 4.0))))
      .toDF("id", "a", "b")
      .select(col("id"), VectorFunctions.vectorDot(col("a"), col("b")).as("d"))
      .orderBy("id")
      .collect()
    assert(df(0).getDouble(1) === 11.0)
    assert(df(1).isNullAt(1))
  }

  test("vector_dot on length-mismatched arrays is null, never a prefix sum") {
    VectorFunctions.register(spark)
    val rows = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),       // aligned
      (2L, Array(1.0, 2.0, 9.0), Array(3.0, 4.0)))  // upstream length bug
      .toDF("id", "a", "b")
      .select(col("id"), VectorFunctions.vectorDot(col("a"), col("b")).as("d"))
      .orderBy("id")
      .collect()
    assert(rows(0).getDouble(1) === 11.0)
    assert(rows(1).isNullAt(1), "mismatched lengths must surface as null")
  }

  test("GraftExtensions injects vector_dot for SQL use") {
    // the shared session lacks the extensions config; exercise the
    // injection path via a temp-registered function + spark.sql
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r === 11.0)
  }
}
