package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local probe for the sink_knn_graph_incremental split
  * (round-13 drift adjudication): builds the index once, then times the
  * O(delta) ingest path alone, min-of-3 after warmup — the same shape
  * Bench's split harness uses, minus the 95 preceding headline queries,
  * so it isolates code cost from late-run box state.
  */
object KnnIncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-knninc-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val full = t {
      operators.SimOps.sinkKnnGraphIncremental(spark, emb, sfDir).count(); ()
    }
    val idx = operators.SimOps.buildKnnIncIndex(spark, emb, sfDir)
    def ingest(): Unit = {
      val (_, _, updated) = operators.SimOps.knnGraphIngestDelta(spark, emb, idx)
      operators.SimOps.knnIncrementalCensus(updated, idx.cutoff).count(); ()
    }
    ingest() // warmup
    val times = Vector.fill(3) { System.gc(); t(ingest()) }
    println(f"full=$full%.3f ingest_min=${times.min}%.3f " +
      f"ingest_all=${times.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
