package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}

/** User-facing API for the native per-group top-k operator. */
object TopKOps {

  /** Idempotent runtime injection (for sessions built without
    * `spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group under `orderCols` — (column, ascending) pairs
    * that MUST form a total order (tie-break down to a unique key): the
    * operator's partial phase is only exact because the retained row set
    * is unique under the ordering.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val lp = GraftSqlShim.analyzed(df)
    def attr(n: String): Attribute =
      lp.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in ${lp.output}"))
    val ordering = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlShim.ofRows(spark, TopKPerGroup(groupCols.map(attr), ordering, k, lp))
  }
}
