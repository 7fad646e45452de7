package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan dump: `.explain("formatted")` of named queries → one text file per
  * query, for the optimization rounds' before/after plan artifacts
  * (plans/rNN/<query>_{before,after}.txt). Usage:
  *   runMain graft.Explain <sfDir> <outDir> <suffix> [names,comma,separated]
  * Environment mirrors Bench (SPARK_GRAFT_CPUS master/shuffle width) so the
  * dumped plans are the ones the bench actually executes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          System.err.println(s"[explain] $name -> ${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
