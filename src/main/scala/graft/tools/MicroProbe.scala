package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-overhead micro-probe (optimization rounds): times the FIXED
  * costs every loop action pays at bench scale — a trivial job, a
  * localCheckpoint barrier, a scalar agg+head pull, and an
  * Observation.get wait — so loop-structure choices (actions per round,
  * observe vs pull) are grounded in measured constants instead of
  * guessed ones.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, reps: Int)(body: => Unit): Unit = {
      body // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[micro] $label%-40s ${sec * 1000}%.1f ms/op")
    }
    val base = spark.range(20000).select(col("id"),
      (col("id") % 97).as("k"), (col("id") * 31 % 1003).cast("double").as("v"))
      .localCheckpoint()
    time("count over checkpointed 20k rows", 10) { base.count(); () }
    time("agg+head over checkpointed 20k rows", 10) {
      base.agg(sum("v")).head(); () }
    time("localCheckpoint of groupBy (1 shuffle)", 10) {
      base.groupBy("k").agg(sum("v").as("s")).localCheckpoint(); () }
    time("ckpt groupBy + agg head pull", 10) {
      val c = base.groupBy("k").agg(sum("v").as("s")).localCheckpoint()
      c.agg(sum("s")).head(); () }
    time("ckpt groupBy + observe get", 10) {
      val o = org.apache.spark.sql.Observation()
      val c = base.groupBy("k").agg(sum("v").as("s"))
        .observe(o, sum(col("s")).as("t")).localCheckpoint()
      o.get("t"); () }
    time("groupBy + crossJoin(broadcast(agg)) ckpt", 10) {
      val g = base.groupBy("k").agg(sum("v").as("s"))
      g.crossJoin(broadcast(g.agg(sum("s").as("t"))))
        .select(col("k"), (col("s") / col("t")).as("n")).localCheckpoint(); () }
    spark.stop()
  }
}
