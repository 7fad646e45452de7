package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps
import graft.operators.PipelineOps

/** Skew resilience of the hash-aggregate dedup family (VERDICT r5 item
  * #8): a real corpus is duplicate-HEAVY — one boilerplate page can be
  * 99% of a crawl slice. The groupBy(key) shape absorbs that without any
  * AQE skew split because aggregation is two-phase: every partition
  * pre-combines its share of the hot key map-side (partial aggregate
  * BELOW the exchange), so the shuffle moves one partial row per
  * (partition, key) — O(partitions), not O(rows) — and the hot key's
  * final combine is partitions-many rows, not 99% of the corpus. These
  * specs pin both the answer and that plan shape on a constructed
  * 99%-one-key corpus, documenting why dedup_exact/dedup_url need no
  * salting while the JOIN-shaped operators do (join_skew_salted/
  * join_skew_aqe).
  */
class SkewSpec extends SparkTestBase {

  // 20k docs: 99% share one text; every 100th is unique (200 singletons)
  private def skewedDocs = spark.range(20000).select(
    col("id").as("doc_id"),
    when(col("id") % 100 === 0, concat(lit("unique page "), col("id")))
      .otherwise(lit("the same boilerplate page")).as("text"))

  test("dedup_exact: 99%-one-key corpus — correct counts, partial agg below the exchange") {
    val out = LlmOps.dedupExact(skewedDocs)
    val rows = out.collect()
    // 200 unique texts + 1 survivor of the hot key
    assert(rows.length === 201)
    val hot = rows.filter(_.getAs[Long]("n_copies") > 1L)
    assert(hot.length === 1)
    assert(hot.head.getAs[Long]("n_copies") === 19800L)
    assert(hot.head.getAs[Long]("keep_id") === 1L, "survivor must be the min doc_id of the hot key")

    val p = out.queryExecution.executedPlan.toString
    // two-phase: a partial HashAggregate must sit BELOW the key exchange
    // (printed tree is top-down, so the partial appears after it)
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_")
    assert(exchange >= 0, s"no hash-partitioned exchange in:\n$p")
    assert(partial > exchange,
      s"no map-side partial aggregate below the exchange — the hot key would shuffle row-by-row:\n$p")
    assert(!p.contains("SinglePartition"),
      s"dedup must not funnel through one partition:\n$p")
  }

  test("dedup_url: 99%-one-canonical-url corpus — hot URL pre-combines map-side") {
    // dedupUrl derives the URL from doc_id (mod 200): collapsing 99% of
    // ids to 0 collapses 99% of rows onto ONE canonical url
    val docs = spark.range(20000).select(
      when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("doc_id"),
      lit("body").as("text"))
    val out = PipelineOps.dedupUrl(docs)
    val rows = out.collect()
    // canonical depends on doc_id mod 200 / mod 20 only, so the surviving
    // ids (multiples of 100) fold into exactly two canonicals: the hot
    // one (19801 zeros + the 99 multiples of 200) and the ≡100 (mod 200)
    // group (100 ids)
    assert(rows.length === 2, s"expected two canonical urls, got:\n${rows.mkString("\n")}")
    val hot = rows.maxBy(_.getAs[Long]("n_copies"))
    assert(hot.getAs[Long]("n_copies") === 19900L)
    assert(hot.getAs[Long]("first_doc") === 0L)

    val p = out.queryExecution.executedPlan.toString
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_")
    assert(exchange >= 0 && partial > exchange,
      s"canonical-url rollup is not two-phase:\n$p")
  }
}
