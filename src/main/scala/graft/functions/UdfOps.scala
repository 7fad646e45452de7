package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF / UDTF surface — SURVEY.md §2.10. The reference's transform
  * stage is arbitrary per-record Python (/root/reference/README.md:22) —
  * i.e., a scalar-UDF surface; custom validation aggregates (README.md:33)
  * imply UDAF; array un-nesting implies a generator.
  *
  * Policy (and the 100 TB caveat): a JVM UDF is opaque to Catalyst — no
  * codegen fusion, no pushdown through it — so built-in expressions are
  * always preferred (every other operator in this engine uses them).
  * These three entries exist to cover the EXTENSION surface itself, with
  * logic chosen to be imperative enough to warrant it while remaining
  * reproducible in the DuckDB oracle.
  */
object UdfOps {

  /** Scalar UDF: position-weighted codepoint checksum of a record key —
    * the "custom cleaning/validation function" shape. Imperative loop over
    * chars (char-level state is where built-ins stop being natural).
    */
  private val checksum = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        acc = (acc + (i + 1).toLong * s.codePointAt(i)) % 9973L
        i += 1
      }
      java.lang.Long.valueOf(acc)
    }
  }

  def udfScalar(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        concat_ws("/", col("source"), col("lang")).as("record_key"),
        checksum(concat_ws("/", col("source"), col("lang"))).as("key_checksum"))
      .orderBy("doc_id")

  /** Typed UDAF via Aggregator[IN, BUF, OUT] (the non-deprecated API):
    * geometric mean — a validation aggregate multiplicative in nature,
    * which no single built-in provides. Buffer is (Σ ln x, n): constant
    * size, associative merge — safe for partial aggregation at any scale.
    */
  private object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1L)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  def udafAggregator(orders: DataFrame): DataFrame = {
    val geoMean = udaf(GeoMean)
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(geoMean(col("o_totalprice")), 4).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  final case class Bigram(doc_id: Long, pos: Int, bigram: String)

  /** UDTF / table function: one input row → many output rows via a typed
    * flatMap (the Dataset-native generator — a custom Catalyst Generator
    * expression is only warranted when codegen fusion matters). Emits
    * positioned word bigrams per document.
    */
  def udtfGenerator(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ")
        toks.iterator.zip(toks.iterator.drop(1)).zipWithIndex.map {
          case ((a, b), i) => Bigram(id, i + 1, s"$a $b")
        }
      }
      .toDF()
      .orderBy("doc_id", "pos")
  }
}
