package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: print exchange/scan/codegen summaries for selected plans.
  * Run: sbt "Test/runMain graft.PlanAudit [sfDir]" — not part of the test
  * suite; PlanSpec holds the asserted plan properties.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def audit(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      val scans = "FileScan|BatchScan".r.findAllIn(p).length
      println(s"== $name: exchanges=$ex scans=$scans wscg=${p.contains("WholeStageCodegen")}")
      p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Window") || l.contains("Scan") || l.contains("Aggregate"))
        .take(16)
        .foreach(l => println("   " + l.trim.take(160)))
    }

    audit("win_sessionize", operators.WindowOps.sessionize(Tables.events(spark, d)))
    audit("text_tfidf", operators.TextOps.textTfidf(Tables.documents(spark, d)))
    audit("sim_join_bucketed", operators.SimOps.simJoinBucketed(Tables.embeddings(spark, d)))
    audit("sample_stratified", operators.RelationalOps.sampleStratified(Tables.lineitem(spark, d)))
    spark.stop()
  }
}
