package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite audit queries — multi-operator pipelines in the TPC-H Q3/Q5/
  * Q10 shapes, the reference's cross-collection audit workload
  * (/root/reference/README.md:27–28) at realistic complexity. These are
  * the composition proof: scans with pushed filters → selective joins
  * (dims broadcast, facts shuffled once) → partial+final aggregation →
  * TakeOrderedAndProject. Dates shifted to the testdata's 1995–2001 span.
  */
object AuditQueries {

  /** Q3 shape — top unshipped-revenue orders for one market segment:
    * filter both fact sides BEFORE the join (pushdown), aggregate on the
    * join key, global top-10 via orderBy+limit.
    */
  def q3ShippingPriority(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1997-06-01").cast("timestamp")
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders.filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").cast("string").as("order_day"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("order_day"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** Q5 shape — per-nation revenue where customer and supplier share the
    * nation, one region, one year: a 6-table join with both dims
    * broadcast and the fact chain shuffled on its natural keys only.
    */
  def q5LocalSupplier(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Q10 shape — top customers by returned-item revenue in one quarter:
    * returned-flag fact filter, three joins, top-20.
    */
  def q10ReturnedItems(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nation: DataFrame): DataFrame =
    customer
      .join(orders.filter(
        col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  /** Funnel analysis over the event stream: users who signed up, then
    * clicked, then purchased IN THAT ORDER — first-occurrence timestamps
    * per (user, stage) from one conditional aggregation (no joins, no
    * explode), then ordering checks. The standard product-analytics shape:
    * one shuffle on user_id, constant state per user.
    */
  def qFunnel(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("t_signup"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_purchase"))
      .select(
        col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
        (col("t_signup").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull &&
          col("t_signup") < col("t_click") && col("t_click") < col("t_purchase"))
          .as("completed_funnel"))
      .orderBy("user_id")

  /** Q6 shape through the SQL ENTRY POINT: registered temp view +
    * `spark.sql(...)` — proving the textual surface compiles to the same
    * Catalyst plans as the DataFrame API (same pushdown, same partial
    * aggregation). The only `spark.sql` query entry; everything else
    * declares plans via the typed API.
    */
  def q6SqlRevenue(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                count(*) AS n_rows
         FROM lineitem_v
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""")
  }

  /** Correlated SCALAR subquery through the SQL surface — every order
    * priced at its own customer's maximum. The audit idiom a raw-
    * collection user writes daily (`WHERE x = (SELECT max(x) …)`);
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelates the per-row
    * subplan into one aggregate joined back on the correlation key —
    * PlanSpec pins that no per-row subquery survives optimization. No
    * arithmetic on the compared doubles, so the DuckDB oracle hash-matches
    * the stored values exactly.
    */
  def qSubqueryScalar(spark: SparkSession, orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders_v o
         WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                               FROM orders_v o2
                               WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""")
  }

  /** EXISTS / NOT EXISTS through the SQL surface — customers with at
    * least one large order and no 'F'-status order. Both predicates
    * decorrelate to semi/anti joins (never a per-row probe).
    */
  def qSubqueryExists(
      spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name
         FROM customer_v c
         WHERE EXISTS (SELECT 1 FROM orders_v o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 150000)
           AND NOT EXISTS (SELECT 1 FROM orders_v o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderstatus = 'F')
         ORDER BY c_custkey""")
  }

  /** IN-subquery through the SQL surface — orders from one market
    * segment's customers; rewrites to a left-semi join on the key.
    */
  def qSubqueryIn(
      spark: SparkSession, orders: DataFrame, customer: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_v")
    customer.createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders_v
         WHERE o_custkey IN (SELECT c_custkey FROM customer_v
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""")
  }
}
