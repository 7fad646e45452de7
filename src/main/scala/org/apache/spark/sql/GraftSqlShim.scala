package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed factory for building a DataFrame from a custom
  * LogicalPlan — the standard extension-library shim (`Dataset.ofRows`
  * is `private[sql]`; Qbeast/Pathling ship the same three lines). This
  * is the ONLY file outside the `graft` package; it contains no logic.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
