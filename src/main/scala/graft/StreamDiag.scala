package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY diagnostic for the stream_outer_join state-bound question
  * (r8 verdict item 5) — prints per-batch state-operator metrics and the
  * executed plan's state-watermark predicates. Not a registry entry;
  * removed after the BASELINE.md paragraph is written.
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-stream-diag").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("diag_stream_src")
    // stage as N files so the watermark advances across real micro-batches
    val nFiles = args.lift(1).map(_.toInt).getOrElse(1)
    if (nFiles == 1)
      java.nio.file.Files.copy(java.nio.file.Paths.get(src),
        dir.resolve("events-0.parquet"))
    else {
      // TIME-ORDERED slices written sequentially (one file per slice, in
      // arrival order) — the production arrival pattern, where the
      // watermark advances between batches and join state can drain
      // raw ts sorts identically to the normalized timestamp, so slice
      // on it directly and write the ORIGINAL rows (schema must match
      // the readStream schema)
      val ev = spark.read.parquet(src)
        .withColumn("slice", ntile(nFiles).over(
          org.apache.spark.sql.expressions.Window.orderBy("ts")))
        .localCheckpoint()
      (1 to nFiles).foreach { i =>
        ev.filter(col("slice") === i).drop("slice")
          .coalesce(1).write.mode("overwrite")
          .parquet(dir.resolve(f"slice_$i%03d").toString)
        Thread.sleep(1100) // distinct mtimes => FileStreamSource arrival order
      }
      val files = java.nio.file.Files.walk(dir).iterator()
      // flatten slice dirs into the source dir in order
      import scala.jdk.CollectionConverters._
      (1 to nFiles).foreach { i =>
        val sd = dir.resolve(f"slice_$i%03d")
        val pq = java.nio.file.Files.list(sd).iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq.head
        java.nio.file.Files.move(pq, dir.resolve(f"events-$i%03d.parquet"))
        java.nio.file.Files.walk(sd).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val _ = files
    }
    val schema = spark.read.parquet(src).schema
    def side(tpe: String, u: String, e: String, t: String): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .transform(graft.Tables.normalizeTs)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(u), col("event_id").as(e), col("ts").as(t))
        .withWatermark(t, "1 hour")
    val purchases = side("purchase", "p_user", "purchase_id", "p_ts")
    val clicks = side("click", "c_user", "click_id", "c_ts")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val t0 = System.nanoTime()
    val q = joined.writeStream.format("memory")
      .queryName("diag_outer").outputMode("append").start()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    println(s"[diag] drain ${"%.2f".format(secs)} s, files=$nFiles, " +
      s"rows=${spark.table("diag_outer").count()}")
    q.recentProgress.foreach { p =>
      p.stateOperators.foreach { so =>
        println(s"[diag] batch=${p.batchId} op=${so.operatorName} " +
          s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
          s"removed=${so.numRowsRemoved} " +
          s"memUsed=${so.memoryUsedBytes}")
      }
    }
    // the executed plan: state watermark predicates for BOTH sides
    println("[diag] lastExecution plan:")
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    import org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec
    val sq = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
    sq.lastExecution.executedPlan.collect {
      case j: StreamingSymmetricHashJoinExec =>
        println(s"[diag] join stateWatermarkPredicates=${j.stateWatermarkPredicates}")
        println(s"[diag] join eventTimeWatermarkForEviction=${j.eventTimeWatermarkForEviction}")
    }
    q.stop()
    spark.stop()
  }
}
