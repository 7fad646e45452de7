package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
import org.apache.spark.sql.functions._

/** CI gate for the LSH-skew class of bug (VERDICT r5 finding #1): an
  * aggregate that `collect_list`s an UNBOUNDED group materializes a
  * degenerate key's whole population in one row — the m²/2 pair cliff on
  * a duplicate-heavy corpus. The rule: every CollectList/CollectSet in a
  * registered query's optimized plan must either be size-cap-filtered
  * downstream (`size(x) <= cap` — the `bucketPairs(maxBucket)` shape) or
  * appear in the allowlist below with a written justification of WHY the
  * group is bounded by construction. A new operator with an uncapped
  * collect fails this suite until its author caps it or argues the bound.
  */
object CollectGuard {

  /** Output-column names of collect aggregates in `df`'s optimized plan
    * that no downstream filter upper-bounds via `size(...)`.
    */
  def uncapped(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    // attributes with an UPPER bound on size(attr) in some Filter — a
    // lower bound alone (size > 1) does not tame the cliff
    val capped: Set[ExprId] = plan.collect { case f: Filter =>
      f.condition.collect {
        case LessThan(s: Size, _) => sizeTarget(s)
        case LessThanOrEqual(s: Size, _) => sizeTarget(s)
        case GreaterThan(_, s: Size) => sizeTarget(s)
        case GreaterThanOrEqual(_, s: Size) => sizeTarget(s)
      }.flatten
    }.flatten.toSet
    plan.collect { case agg: Aggregate =>
      agg.aggregateExpressions.collect {
        case ne if ne.exists {
              case ae: AggregateExpression =>
                ae.aggregateFunction.isInstanceOf[CollectList] ||
                  ae.aggregateFunction.isInstanceOf[CollectSet]
              case _ => false
            } && !capped.contains(ne.exprId) =>
          ne.name
      }
    }.flatten
  }

  private def sizeTarget(s: Size): Option[ExprId] = s.child match {
    case a: AttributeReference => Some(a.exprId)
    case _ => None
  }
}

class CollectGuardSpec extends SparkTestBase {
  import spark.implicits._

  /** Justified unbounded-group collects. Keys are query names, values the
    * flagged output columns. Every entry argues a CONSTRUCTION bound —
    * "the data happens to be small" is not admissible.
    */
  /** Keyed by query name, not column: the kmeans family localCheckpoints
    * mid-construction, so WHICH collect survives into the visible lineage
    * (and under what collapsed alias) varies run to run — a column-level
    * key would flake. A new query is still gated: it isn't in this map.
    */
  private val allow: Set[String] = Set(
    // ordered-fold input (AggOps.aggEwma): one array per user of THAT
    // user's events — the per-key series an EWMA inherently consumes; the
    // streaming form (stream_stateful) is the documented unbounded-series
    // escape hatch
    "agg_ewma",
    // nearest-rank order statistic from the per-flag sorted array — the
    // documented bounded-group exact form; unbounded groups take the
    // histogram-rank selection text_perplexity_filter demonstrates
    // (AggOps.aggPercentileDisc Scaladoc)
    "agg_percentile_disc",
    // the collected array IS a bounded dim table (25 nations per region):
    // a dim too big for one row would have stopped broadcasting first
    "agg_collect",
    // per-document passage/line reassembly after the dedup/boilerplate
    // filter (LlmOps.dedupParagraph, TextOps.textBoilerplate): the group
    // is ONE document's own segments, bounded by document length — the
    // same per-doc bound every text operator already carries
    "dedup_paragraph", "text_boilerplate",
    // the PCA component folds (SimOps.simPcaProject/Project2d,
    // sinkPcaLayout): the collected arrays are 64-loading principal
    // components — the dim count is a plan constant, never a
    // data-dependent group size
    "sim_pca_project", "sim_pca_project2d", "sink_pca_layout",
    // coreset rides the same k-cell codebook fold (algorithm constant)
    "pipeline_coreset",
    // centroid/codebook assembly across the kmeans family: arrays of
    // k (≤16) centroids or 8 sub-codebooks — algorithm constants chosen
    // at plan time, not data-dependent group sizes
    "sim_kmeans", "sim_ivf_kmeans", "sim_pq", "sim_pq_kmeans",
    "sim_ivf_pq", "sim_ood_detect", "sim_mips", "sink_ann_index",
    "dedup_semantic",
    // round 8: the kNN graph now trains the same k=16 codebook for its
    // nprobe cells — the identical bounded-constant collect (the cluster
    // entry builds on the graph and inherits it)
    "sim_knn_graph", "sim_knn_graph_recall", "sim_knn_cluster",
    "pipeline_hard_negatives",
    // the HOF product fold consumes one array per ORDER of that order's
    // line quantities — bounded by lines-per-order (≤ 17 in the fixture,
    // a 7-line cap in the TPC-H spec), the agg_collect dim-bound rule
    "agg_product",
    // r12 unigram trainer: the group is ONE word's in-vocab substring
    // occurrences, ≤ 4·len(w) ≤ 128 by the 32-char word cap the loop
    // enforces structurally (PipelineOps.unigramLoop) — the per-doc
    // bound rule, one level finer
    "pipeline_unigram_lm", "pipeline_unigram_fertility",
    "pipeline_unigram_apply",
    // r13 Holt tracker: the collected array is the (day, n) HISTOGRAM —
    // calendar-bounded (days, never events), the same bounded-histogram
    // exemption the cusum/seasonal windows ride; the recurrence is a
    // genuine sequential fold, so the series must materialize once
    "ts_holt", "ts_holt_forecast"
  )

  test("guard catches an uncapped collect_list (deliberately-bad fixture)") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .groupBy("k").agg(collect_list("v").as("vs"))
    assert(CollectGuard.uncapped(df) === Seq("vs"))
  }

  test("guard accepts a size-capped collect_list and is not fooled by a lower bound") {
    val base = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .groupBy("k").agg(collect_list("v").as("vs"))
    assert(CollectGuard.uncapped(base.filter(size(col("vs")) <= 10)).isEmpty)
    assert(CollectGuard.uncapped(base.filter(size(col("vs")) > 1)) === Seq("vs"),
      "a lower bound alone must not count as a cap")
    assert(CollectGuard.uncapped(
      base.filter(size(col("vs")) > 1 && size(col("vs")) <= 10)).isEmpty,
      "the bucketPairs shape (lower AND upper) is capped")
  }

  test("every registry query's collects are capped or justified") {
    // stream_* construction drains real streams (covered by StreamSpec's
    // own state-bound assertions — watermark/dedup state, not collects)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => name.startsWith("stream_") || allow(name) }
      .flatMap { case (name, fn) =>
        val bad = CollectGuard.uncapped(fn(spark, sf0001))
        if (bad.isEmpty) None else Some(s"$name: uncapped collect -> ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty,
      "uncapped collect aggregates (cap with size(..)<=N or justify in `allow`):\n" +
        offenders.mkString("\n"))
  }
}
