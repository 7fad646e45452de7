package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the engine.
  *
  * The reference's data world is "one raw collection per connector"
  * (/root/reference/README.md:27, 98); here each collection is a parquet
  * table under a scale-factor directory. All `SparkEntry.queries` entries
  * receive the directory and load through this object so that the physical
  * layout (single parquet file locally; partitioned directories at 100 TB)
  * is decided in exactly one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. At scale the same call works on a partitioned
    * directory (`dir/name.parquet/date=...`) — Spark handles both
    * layouts; partition pruning applies automatically when the layout
    * is partitioned.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (which the
    * Spark 4 vectorized reader rejects unless read as a raw long via
    * `nanosAsLong`) and plain TIMESTAMP(MICROS) (which reads as
    * TIMESTAMP_NTZ) across fixture generations. Dispatch on the OBSERVED
    * type rather than assuming one: nanos-as-long truncates to micros
    * (`div` is integer division — exact, unlike `/1000` through double),
    * NTZ casts to session-TZ TimestampType (identity on the instant —
    * every session here pins UTC). Every consumer sees one normal `ts`
    * column; DuckDB oracles read the same column natively and parity is
    * achieved by emitting epoch-micros bigints on both sides.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
