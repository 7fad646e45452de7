package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the relational tables — the §2.11 extension
  * family's "iterate a join + aggregate to a fixed depth" workload.
  * PageRank is the archetype: the same shape (message join on src,
  * aggregate on dst, rank update) is label propagation, connected
  * components (dedup_clusters), and belief propagation. The engine form
  * is DataFrame-native Pregel: edges are materialized ONCE and reused
  * every superstep; each superstep is one equi-join plus one hash
  * aggregate, both shuffling on compact long keys — no driver-side graph,
  * no per-vertex RDD closures, scales with the shuffle layer.
  *
  * TWO superstep regimes, gated on node count (not assumed):
  *  - broadcast (n ≤ [[GraphOps.BroadcastNodeLimit]]): the rank vector is
  *    checkpointed as one partition and broadcast into the join — zero
  *    join shuffle, ONE shuffle per round (the dst aggregate). Right
  *    while the rank vector fits an executor, a scale cliff past it.
  *  - partitioned (n above the limit, or the explicit entry): edges are
  *    hash-partitioned by src ONCE at build; each round's rank vector
  *    leaves the dst aggregate already hash-partitioned on id, so the
  *    superstep join co-locates with NO broadcast and no extra exchange —
  *    the edge side never re-shuffles, the rank side moves only through
  *    the aggregate. No per-round single-task serialization point, no
  *    O(nodes) broadcast: the regime that survives billions of nodes.
  * Both regimes compute identical ranks (same oracle).
  */
object GraphOps {

  /** Above this node count the rank vector stops being treated as
    * executor-broadcast-sized and the partitioned regime takes over.
    * ~50 M ids+doubles ≈ 800 MB raw — conservatively inside a typical
    * executor, far outside nothing.
    */
  val BroadcastNodeLimit: Long = 50L * 1000 * 1000

  /** Build the undirected trade graph once: edge list with out-degrees,
    * CACHED for superstep reuse (GraphX keeps its edge RDD resident the
    * same way; cache rather than checkpoint because InMemoryTableScan
    * preserves the src HashPartitioning the partitioned regime's join
    * co-locates on, while a checkpoint scan reports unknown partitioning
    * — measured, see loopPartitioned). Callers unpersist via the handle
    * after their final ranks are checkpoint-materialized.
    * An undirected edge (both directions materialized)
    * links a customer to every supplier whose parts they ordered; node
    * ids are disjoint by parity (customers even, suppliers odd) so one
    * long column carries both sides. Bidirectional edges mean every node
    * has out-degree ≥ 1 (no dangling-mass correction, rank mass conserved
    * — the spec pins sum(rank) = 1) and in-degree ≥ 1 (the contribution
    * aggregate covers every node — no per-round left join).
    *
    * Out-degree via an unordered window over src: ONE shuffle of the edge
    * list, vs two (aggregate + re-join) for the groupBy form — measured
    * ~25% off the one-time graph build at sf0.1. The explicit
    * `repartition(parts, src)` pins that shuffle's layout (src-only key,
    * fixed partition count AQE can't coalesce) — the SAME shuffle the
    * window needs anyway, now also exactly the layout the partitioned
    * superstep join wants to find. Both regimes share this build.
    */
  private[graft] def buildGraph(
      orders: DataFrame, lineitem: DataFrame): (DataFrame, DataFrame, Long) = {
    val pairs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val edges = pairs
      .select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("supp") * 2 + 1).as("src"), (col("cust") * 2).as("dst")))
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val withDeg = edges
      .repartition(parts, col("src"))
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
      .persist()
    val nodes = withDeg.select(col("src").as("id")).distinct()
    val n = nodes.count() // also materializes the edge cache
    (withDeg, nodes, n)
  }

  private def finish(ranks: DataFrame): DataFrame =
    ranks
      .select(col("id").as("node_id"), round(col("rank"), 6).as("pr"))
      .orderBy(col("pr").desc, col("node_id"))
      .limit(100)

  /** Broadcast-regime superstep loop. The rank vector is explicitly
    * `broadcast` into the join — a checkpointed frame carries no size
    * stats, so Catalyst would otherwise plan a full edge shuffle EVERY
    * round (measured ~2× slower at sf0.1) — and checkpointed as ONE
    * partition: the per-round materialization job collapses from 32
    * near-empty tasks to one and the broadcast rebuild reads one block
    * instead of 32 (measured ~25% off the 10-round loop at sf0.1). Valid
    * ONLY while n ≤ BroadcastNodeLimit — callers gate, this assumes.
    */
  private def loopBroadcast(withDeg: DataFrame, nodes: DataFrame, n: Long,
      rounds: Int, damping: Double): DataFrame = {
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .coalesce(1).localCheckpoint()
    for (_ <- 1 to rounds) {
      ranks = withDeg.join(broadcast(ranks), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
        .select(col("dst").as("id"),
          (lit((1 - damping) / n) + lit(damping) * col("c")).as("rank"))
        .coalesce(1).localCheckpoint()
    }
    withDeg.unpersist() // final ranks are checkpoint-materialized above
    finish(ranks)
  }

  /** Partitioned-regime superstep loop — hint-free. Frame reuse is CACHE-
    * based, not checkpoint-based, because that is what preserves the
    * partitioning contract: a localCheckpoint comes back as a bare
    * ExistingRDD scan with UNKNOWN partitioning (measured — both join
    * sides then re-exchange every round), while an InMemoryTableScan
    * reports the cached plan's HashPartitioning (and AQE is barred from
    * changing it — `canChangeCachedPlanOutputPartitioning` defaults
    * false). So: edges stay cached src-partitioned for the whole loop;
    * each round's rank vector leaves the dst aggregate hash-partitioned
    * on id (alias-preserved through the rename), is cached + materialized,
    * and the previous round's cache is dropped. The next round's src=id
    * join then co-locates — no forced broadcast, no coalesce(1), no
    * exchange on either join input (PlanSpec pins it at the at-scale
    * broadcast threshold): ONE shuffle per round (the dst aggregate),
    * O(nodes/partitions) rows per task. Catalyst MAY still auto-broadcast
    * the rank side while its measured size is under the threshold — that
    * is stats-driven and stops on its own at scale, exactly the
    * hint-free behavior this regime exists for. The final ranks are
    * localCheckpoint'ed (lineage truncation — partitioning no longer
    * matters) so every cache can be released before returning.
    */
  private def loopPartitioned(withDeg: DataFrame, nodes: DataFrame, n: Long,
      rounds: Int, damping: Double): DataFrame = {
    val parts = withDeg.sparkSession.sessionState.conf.numShufflePartitions
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .repartition(parts, col("id")).persist()
    ranks.count()
    for (_ <- 1 to rounds) {
      val next = superstepPartitioned(withDeg, ranks, n, damping).persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    val result = ranks.localCheckpoint()
    ranks.unpersist()
    withDeg.unpersist()
    finish(result)
  }

  /** One partitioned superstep, exposed for the PlanSpec pin. */
  private[graft] def superstepPartitioned(
      withDeg: DataFrame, ranks: DataFrame, n: Long, damping: Double): DataFrame =
    withDeg.join(ranks, col("src") === col("id"))
      .groupBy(col("dst"))
      .agg(sum(col("rank") / col("outdeg")).as("c"))
      .select(col("dst").as("id"),
        (lit((1 - damping) / n) + lit(damping) * col("c")).as("rank"))

  /** PageRank with a FIXED round count (default 10) — deterministic and
    * oracle-pairable (the DuckDB oracle unrolls the same rounds as
    * chained CTEs). The regime switch is ENFORCED here on the measured
    * node count, not documented-and-hoped: the sf-scale graph exercises
    * the broadcast arm; the partitioned arm has its own entry + plan pin.
    *
    * Shared scale note: each round's ranks are checkpointed so round k's
    * plan does not re-evaluate rounds 1..k-1. (The all-lazy alternative —
    * one 10-deep plan, no per-round action — was measured SLOWER: the
    * stages still execute serially and the deep plan adds analysis/AQE
    * overhead per stage.)
    */
  def graphPagerank(orders: DataFrame, lineitem: DataFrame,
      rounds: Int = 10, damping: Double = 0.85): DataFrame = {
    val (withDeg, nodes, n) = buildGraph(orders, lineitem)
    if (n <= BroadcastNodeLimit) loopBroadcast(withDeg, nodes, n, rounds, damping)
    else loopPartitioned(withDeg, nodes, n, rounds, damping)
  }

  /** The partitioned regime as its own entry, so the 100 TB path is
    * executable and correctness-checked at every scale — not a comment.
    * Identical ranks to `graphPagerank` (same oracle SQL).
    */
  def graphPagerankPartitioned(orders: DataFrame, lineitem: DataFrame,
      rounds: Int = 10, damping: Double = 0.85): DataFrame = {
    val (withDeg, nodes, n) = buildGraph(orders, lineitem)
    loopPartitioned(withDeg, nodes, n, rounds, damping)
  }

  /** Triangle counting over the supplier co-purchase graph — the second
    * classic iterative-analytics kernel (community density, spam/fraud
    * motifs) and a deliberately DIFFERENT join shape from PageRank: not a
    * loop but a two-hop wedge join plus a closing semi-join.
    *
    * Graph: suppliers link when their shared-customer count reaches the
    * 99th PERCENTILE of all co-purchase counts — a scale-adaptive rule
    * (purchasing here is near-uniform, so any fixed absolute threshold
    * yields either the complete graph or the empty one, at every scale
    * factor; the top-percentile rule always extracts the strongest 1% of
    * relationships). The percentile is the exact interpolating one, so
    * DuckDB's quantile_cont reproduces it bit-for-bit (the agg_median
    * precedent). The co-purchase projection (postings self-join on the
    * customer key) is the quadratic hazard — per-customer cost is deg² —
    * so hub customers are capped (deg ≤ 256, the LSH `maxBucket` rule;
    * a no-op on this data, the guard that keeps 100 TB linear-ish), and
    * the oracle applies the identical cap.
    *
    * Counting: edges oriented by id (s1 < s2) make each triangle appear
    * as exactly one wedge a<b<c (join on the shared middle b) closed by
    * one (a,c) semi-join — no triangle is double-counted and no
    * all-pairs stage exists; every join key is a compact int. Output:
    * top-10 suppliers by triangle participation.
    */
  def graphTriangles(orders: DataFrame, lineitem: DataFrame,
      maxCustDeg: Int = 256): DataFrame = {
    val pairs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val smallCust = pairs.groupBy(col("cust"))
      .agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") <= maxCustDeg)
      .select("cust")
    val kept = pairs.join(smallCust, "cust")
    val co = kept.select(col("cust"), col("supp").as("s1"))
      .join(kept.select(col("cust"), col("supp").as("s2")), Seq("cust"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("shared"))
    val thr = co.agg(percentile(col("shared"), lit(0.99)).as("t"))
    val edges = co.crossJoin(broadcast(thr))
      .filter(col("shared") >= col("t"))
      .select("s1", "s2")
    val wedges = edges.select(col("s1").as("a"), col("s2").as("b"))
      .join(edges.select(col("s1").as("b"), col("s2").as("c")), Seq("b"))
    val tri = wedges.join(
      edges.select(col("s1").as("a"), col("s2").as("c")),
      Seq("a", "c"), "left_semi")
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("supp_id"))
      .groupBy(col("supp_id"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), asc("supp_id"))
      .limit(10)
  }
}
