package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).
  * Grounded in newest-first audit views, result pagination, and
  * delta-between-loads semantics (/root/reference/README.md:12, 28).
  *
  * Scale notes (100 TB): a global `orderBy` is a range-partitioned
  * total sort — legitimate for bounded audit views, never for a full raw
  * table (use sortWithinPartitions for layout control instead). `topk` and
  * `limitPage` compile to TakeOrderedAndProject: per-partition heap of k,
  * driver merges k·p rows — no full sort, no full shuffle. Set operations
  * are aggregates/joins underneath: one shuffle on all columns.
  */
object SortSetOps {

  /** Global order, newest first, tie-broken unique (README.md:28 audit
    * views are "latest first").
    */
  def sortGlobal(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))

  /** Ordered pagination (mirrors source-side pagination, README.md:12):
    * deterministic page = total order + limit ⇒ TakeOrderedAndProject.
    */
  def limitPage(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
      .limit(100)

  /** Global top-k by value — MUST plan as TakeOrderedAndProject (orderBy
    * then limit), never a window over the full table.
    */
  def topk(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Physical layout control: cluster rows by key inside each partition
    * without a global shuffle-sort — the 100 TB write-path pattern
    * (run-length/dictionary-friendly parquet, min-max pruning).
    * Oracle-paired on CONTENT since round 8 (the reorder is
    * row-preserving, so the unsorted table is the exact multiset; the
    * driver compare canonicalizes row order); the partition-local sort
    * ORDER itself is content-invisible and stays pinned by the spec.
    */
  def sortWithinPartitions(lineitem: DataFrame): DataFrame =
    lineitem
      .repartition(col("l_returnflag"))
      .sortWithinPartitions("l_returnflag", "l_shipdate")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_shipdate"))

  /** Combine loads/pages — UNION ALL by NAME (JSON column order is
    * unstable across pages, README.md:12; positional union would silently
    * mis-zip).
    */
  def unionLoads(orders: DataFrame): DataFrame = {
    val page1 = orders.filter(col("o_totalprice") < 50000)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("page", lit(1))
    // deliberately different column order — unionByName must re-align
    val page2 = orders.filter(col("o_totalprice") >= 150000)
      .select(col("o_totalprice"), col("o_orderkey"))
      .withColumn("page", lit(2))
    page1.unionByName(page2.select(col("o_orderkey"), col("o_totalprice"), col("page")))
      .orderBy("o_orderkey", "page")
  }

  /** Schema-EVOLVED union (`unionByName(allowMissingColumns = true)`) —
    * the page-merge shape when the upstream API adds a field mid-extract:
    * early pages lack the new column and must backfill NULL, not fail
    * the load and not mis-zip positionally. Resolution is analysis-time
    * (a Project per branch), so the union itself stays a zero-cost plan
    * node.
    */
  def unionEvolved(orders: DataFrame): DataFrame = {
    val early = orders.filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    // the later page carries the newly-added priority field
    val late = orders.filter(col("o_orderkey") % 4 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority").as("priority"))
    early.unionByName(late, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  /** Records present in both loads (distinct semantics — Spark INTERSECT
    * ≡ SQL INTERSECT).
    */
  def intersectLoads(customer: DataFrame): DataFrame = {
    val loadA = customer.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_nationkey"), col("c_mktsegment"))
    val loadB = customer.filter(col("c_custkey") % 3 =!= 1)
      .select(col("c_nationkey"), col("c_mktsegment"))
    loadA.intersect(loadB).orderBy("c_nationkey", "c_mktsegment")
  }

  /** New-since-last-load delta — EXCEPT (distinct): keys in the new load
    * that the previous load lacked (README.md:28 update detection).
    */
  def exceptLoads(orders: DataFrame): DataFrame = {
    val newLoad = orders.select(col("o_custkey"))
    val oldLoad = orders.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey"))
    newLoad.except(oldLoad).orderBy("o_custkey")
  }

  /** Bag-semantics EXCEPT ALL: each occurrence in the old load cancels
    * exactly one occurrence in the new — the multiset delta (how many MORE
    * times a key appears since the last load).
    */
  def exceptAllLoads(orders: DataFrame): DataFrame = {
    val newLoad = orders.select(col("o_custkey"))
    val oldLoad = orders.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey"))
    newLoad.exceptAll(oldLoad)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("surplus"))
      .orderBy("o_custkey")
  }

  /** Bag-semantics INTERSECT ALL: per-key min multiplicity across loads. */
  def intersectAllLoads(orders: DataFrame): DataFrame = {
    val loadA = orders.filter(col("o_orderkey") % 3 =!= 0).select(col("o_custkey"))
    val loadB = orders.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey"))
    loadA.intersectAll(loadB)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_common"))
      .orderBy("o_custkey")
  }

  /** PARETO SKYLINE (dominance) — orders no other order beats on BOTH
    * dials at once (minimize price, maximize recency; strict somewhere).
    * A new operator class for the registry: dominance is a quadratic
    * NOT-EXISTS theta-join spelled naively (the oracle keeps that
    * spelling), but on a 2-D skyline it collapses to a CUMULATIVE MAX
    * along the price order — a point survives iff no strictly-cheaper
    * point is at least as recent and no equal-price point is strictly
    * more recent. The cumulative max itself would be an unpartitioned
    * corpus window, so it runs TWO-LEVEL (the denseRankById machinery a
    * third time): ≤1024 contiguous price buckets (lower bucket ⇒
    * strictly smaller price, so the running bucket-max is exactly "max
    * recency among cheaper buckets"), the only unpartitioned window on
    * the ≤1024-row bucket frame, and the intra-bucket strict-price
    * cummax as a RANGE frame PARTITIONED by bucket. Prices compare in
    * exact cents, dates in exact epoch days — no float anywhere.
    */
  def paretoSkyline(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = orders.select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"),
      datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("dt"))
    val b = pts.agg(min(col("price_c")), max(col("price_c"))).head()
    val lo = b.getLong(0)
    val width = (b.getLong(1) - lo) / 1024L + 1L
    val bucketed = pts.withColumn("bkt",
      expr(s"CAST((price_c - (${lo}L)) DIV ${width}L AS LONG)"))
    val below = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bmax = bucketed.groupBy(col("bkt")).agg(max(col("dt")).as("bmx"))
      .withColumn("below_mx", max(col("bmx")).over(below)) // ≤1024-row window
      .select(col("bkt"), col("below_mx"))
    val strictLess = Window.partitionBy("bkt").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy("price_c")
    val flagged = bucketed.join(broadcast(bmax), "bkt")
      .withColumn("less_mx",
        greatest(coalesce(col("below_mx"), lit(Long.MinValue)),
          coalesce(max(col("dt")).over(strictLess), lit(Long.MinValue))))
      .withColumn("same_mx", max(col("dt")).over(samePrice))
      .filter(!(col("less_mx") >= col("dt") || col("same_mx") > col("dt")))
    flagged.select(col("k"), col("price_c"), col("dt"))
      .orderBy("price_c", "dt", "k")
  }
}
