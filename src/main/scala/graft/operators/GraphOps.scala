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
  */
object GraphOps {

  /** PageRank over the customer–supplier trade graph: an undirected edge
    * (both directions materialized) links a customer to every supplier
    * whose parts they ordered. Node ids are disjoint by parity
    * (customers even, suppliers odd) so one long column carries both
    * sides. A FIXED round count (default 10) keeps the result
    * deterministic and oracle-pairable — the DuckDB oracle unrolls the
    * same rounds as chained CTEs. Bidirectional edges mean every node in
    * the graph has out-degree ≥ 1, so no dangling-mass correction is
    * needed and rank mass is conserved each round (the spec pins
    * sum(rank) = 1).
    *
    * Scale shape: the edge list is `localCheckpoint`ed once and reused
    * every round (GraphX keeps its edge RDD resident the same way); each
    * round's ranks are checkpointed so round k's plan does not
    * re-evaluate rounds 1..k-1. (The all-lazy alternative — one 10-deep
    * plan, no per-round action — was measured SLOWER: the ten nested
    * broadcast stages still execute serially and the deep plan adds
    * analysis/AQE overhead per stage.) The rank vector is explicitly
    * `broadcast` into the superstep join — a checkpointed frame carries
    * no size stats, so Catalyst would otherwise plan a full edge shuffle
    * EVERY round (measured ~2× slower at sf0.1); the hint leaves ONE
    * shuffle per round (the dst aggregate). It is honest up to rank
    * vectors that fit an executor (~100 M nodes); past that, drop the
    * hint and pre-partition edges by src so the join co-locates instead.
    * Symmetric edges also mean every node has in-degree ≥ 1, so the
    * contribution aggregate already covers every node — no per-round
    * dangling-node left-join is needed.
    */
  def graphPagerank(orders: DataFrame, lineitem: DataFrame,
      rounds: Int = 10, damping: Double = 0.85): DataFrame = {
    val pairs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val edges = pairs
      .select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("supp") * 2 + 1).as("src"), (col("cust") * 2).as("dst")))
    // out-degree via an unordered window over src: ONE shuffle of the
    // edge list, vs two (aggregate + re-join) for the groupBy form —
    // measured ~25% off the one-time graph build at sf0.1
    val withDeg = edges
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
      .localCheckpoint()
    val nodes = withDeg.select(col("src").as("id")).distinct().localCheckpoint()
    val n = nodes.count()
    // The rank vector is executor-broadcast-sized BY ASSUMPTION (see the
    // broadcast hint above), so checkpoint it as ONE partition: the
    // per-round materialization job collapses from 32 near-empty tasks to
    // one, and the broadcast rebuild reads one block instead of 32 —
    // measured ~25% off the 10-round loop at sf0.1. Past the
    // fits-one-executor regime, drop the coalesce together with the
    // broadcast hint and pre-partition by id instead.
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
    ranks
      .select(col("id").as("node_id"), round(col("rank"), 6).as("pr"))
      .orderBy(col("pr").desc, col("node_id"))
      .limit(100)
  }
}
