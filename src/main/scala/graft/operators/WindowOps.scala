package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface — SURVEY.md §2.5. Grounded in
  * ingestion-timestamp audits and update resolution
  * (/root/reference/README.md:28, 99): latest-per-key, drift vs the
  * previous load, running ingest totals, time-bounded views.
  *
  * Scale notes (100 TB): every window below is keyed (`partitionBy`) — one
  * shuffle on the partition key, per-key local sort, no global sort and no
  * unbounded state. Ordering columns always end in a unique tie-break
  * (event_id / orderkey) so frames — and therefore results — are
  * deterministic under any partitioning. Never use an un-partitioned
  * window over big data (single-task sort); the global top-k lives in
  * SortSetOps.topk as TakeOrderedAndProject instead.
  */
object WindowOps {

  private def perUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** Latest event per user via row_number — THE dedup/upsert resolution
    * shape (README.md:28): one shuffle, one row per key survives.
    */
  def rowNumberLatest(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("latest_event"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .orderBy("user_id")
  }

  /** Ranking family: rank (gaps), dense_rank (no gaps), percent_rank on a
    * non-unique order key (p_size — ties rank identically in any engine);
    * ntile over a unique ordering (ties would make ntile nondeterministic).
    */
  def rankDense(part: DataFrame): DataFrame = {
    val bySize = Window.partitionBy("p_brand").orderBy("p_size")
    val unique = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    part
      .select(
        col("p_partkey"), col("p_brand"), col("p_size"),
        rank().over(bySize).as("rnk"),
        dense_rank().over(bySize).as("drnk"),
        round(percent_rank().over(bySize), 6).as("prnk"),
        ntile(4).over(unique).as("quartile"))
      .orderBy("p_partkey")
  }

  /** Value window functions: first/last/nth over the WHOLE partition
    * (frame pinned to unbounded-both-ways — the default frame stops at the
    * current row, a classic silent-wrong-answer trap in every engine) plus
    * cume_dist on the ordering key.
    */
  def valueFns(part: DataFrame): DataFrame = {
    val order = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    val whole = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    part
      .select(
        col("p_partkey"), col("p_brand"), col("p_size"),
        first(col("p_partkey")).over(whole).as("smallest_part"),
        last(col("p_partkey")).over(whole).as("largest_part"),
        nth_value(col("p_partkey"), 2).over(whole).as("second_part"),
        round(cume_dist().over(order), 6).as("cdist"))
      .orderBy("p_partkey")
  }

  /** Delta vs previous/next event of the same user — audit drift between
    * loads (README.md:28).
    */
  def lagLead(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"), col("user_id"),
        round(col("value"), 4).as("value"),
        round(lag(col("value"), 1).over(perUser), 4).as("prev_value"),
        round(lead(col("value"), 1).over(perUser), 4).as("next_value"),
        round(col("value") - lag(col("value"), 1).over(perUser), 4).as("delta"))
      .orderBy("event_id")

  /** Running (cumulative) total per user in event order — cumulative
    * ingest counters. Unique ordering ⇒ one canonical summation order ⇒
    * float-stable across engines.
    */
  def running(events: DataFrame): DataFrame = {
    val w = perUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(
        col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 4).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("event_id")
  }

  /** Sliding ROWS frame: moving average over the last 4 events per user. */
  def slidingFrame(events: DataFrame): DataFrame = {
    val w = perUser.rowsBetween(-3, Window.currentRow)
    events
      .select(
        col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 4).as("moving_avg"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy("event_id")
  }

  /** Time-RANGE frame: per user, total value over the trailing hour of
    * events (README.md:99 timestamp audits). Range frames order by the
    * numeric epoch so the 3600 s bound is engine-independent.
    */
  def rangeFrame(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600L, Window.currentRow)
    events
      .withColumn("epoch_s", unix_micros(col("ts")).divide(lit(1000000L)).cast("long"))
      .select(
        col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 4).as("hour_value"),
        count(lit(1)).over(w).as("hour_n"))
      .orderBy("event_id")
  }

  /** Batch sessionization: gap-based sessions (30 min) per user from two
    * keyed windows — lag to flag session starts, running sum to number
    * them — then one aggregation per (user, session). The batch twin of
    * streaming session_window (StreamOps.streamSession): same semantics,
    * same single shuffle on user_id, no state store. Timestamps surface as
    * epoch-micros bigints (the engine-portable form for the compare).
    */
  /** Rolling MAD outlier flags — the robust anomaly detector (median
    * absolute deviation is unmoved by the outliers it hunts, unlike
    * mean/σ): over each user's trailing 9-event frame, med = exact
    * median, MAD = median of |x − med|, flag when |x − med| > 3·MAD.
    * Spark rejects median in framed windows, so both medians COMPOSE
    * from the frame-bounded sorted array (the win_median_sliding rule —
    * frame width caps the array, never data-scaled). Values are exact
    * integer cents; medians of 9 integers are integer-or-half values
    * exact in double on both engines.
    */
  def winMadOutlier(events: DataFrame, frame: Int = 9,
      nMads: Double = 3.0): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val fr = byUser.rowsBetween(-(frame - 1), 0)
    def medOf(arr: Column): Column = {
      val n = size(arr)
      val lo = floor((n + 1) / 2).cast("int")
      val hi = (floor(n / 2) + 1).cast("int")
      (element_at(arr, lo) + element_at(arr, hi)).cast("double") / 2.0
    }
    val base = events.select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("y"))
    base
      .withColumn("arr", sort_array(collect_list(col("y")).over(fr)))
      .withColumn("med", medOf(col("arr")))
      .withColumn("madarr", sort_array(transform(col("arr"),
        x => abs(x.cast("double") - col("med")))))
      .withColumn("mad", medOf2(col("madarr")))
      .select(
        col("user_id"), col("event_id"), col("y"),
        col("med"), col("mad"),
        (size(col("arr")) >= frame &&
          abs(col("y").cast("double") - col("med")) > lit(nMads) * col("mad"))
          .as("is_outlier"))
      .orderBy("user_id", "event_id")
  }

  // median of an already-sorted DOUBLE array (the MAD inner median)
  private def medOf2(arr: Column): Column = {
    val n = size(arr)
    val lo = floor((n + 1) / 2).cast("int")
    val hi = (floor(n / 2) + 1).cast("int")
    (element_at(arr, lo) + element_at(arr, hi)) / 2.0
  }

  /** LAST-TOUCH ATTRIBUTION — each purchase credited to the user's most
    * recent preceding click (the marketing-analytics join every event
    * warehouse runs). The "most recent preceding" is a conditional MAX
    * over the unbounded-to-1-PRECEDING frame — one user-partitioned
    * window, no self-join, no as-of machinery; purchases with no prior
    * click surface as organic (NULL click, latency NULL). Latency is
    * integer-floor seconds (identical division on both engines).
    */
  def winAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        floor(col("ts_us") / 1000000L).cast("long").as("purchase_s"),
        floor(col("last_click_us") / 1000000L).cast("long").as("click_s"),
        floor((col("ts_us") - col("last_click_us")) / 1000000L).cast("long")
          .as("latency_s"))
      .orderBy("event_id")
  }

  /** ROLLING REGRESSION — per-user OLS slope of event value over the
    * last 5 events (the windowed trend feature an anomaly detector
    * reads). The x axis is the event's per-user rank (small exact
    * integers), y is value-CENTS; the five frame-bounded sufficient
    * sums (n, Σx, Σy, Σxy, Σx²) are window aggregates over ONE
    * user-partitioned sort, and the slope is the agg_regression closed
    * form entering doubles only at the final projection. Degenerate
    * frames (n < 2, or zero x-variance) yield NULL via an explicit
    * guard — IEEE ∞/NaN would hash-compare engine-specifically.
    */
  def winRollingRegression(events: DataFrame, frame: Int = 5): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val fr = byUser.rowsBetween(-(frame - 1), 0)
    val base = events.select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("y"))
    val withX = base.withColumn("x", row_number().over(byUser).cast("long"))
    val s = withX
      .withColumn("n", count(lit(1)).over(fr))
      .withColumn("sx", sum(col("x")).over(fr))
      .withColumn("sy", sum(col("y")).over(fr))
      .withColumn("sxy", sum(col("x") * col("y")).over(fr))
      .withColumn("sxx", sum(col("x") * col("x")).over(fr))
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    s.select(
      col("user_id"), col("x").as("rn"), col("y"),
      when(col("n") >= 2 && den =!= 0.0, round(num / den, 6))
        .otherwise(lit(null).cast("double")).as("slope5"))
      .orderBy("user_id", "rn")
  }

  /** Gaps-and-islands STREAKS — longest run of consecutive active DAYS
    * per user (the retention/engagement feature every activity warehouse
    * computes). The island key is the classic date-minus-row_number
    * constant, kept in PURE INTEGER day arithmetic (days since the epoch
    * anchor minus rank — no interval types, identical on both engines).
    * Two shuffles total: the distinct (user, day) projection and its
    * user-partitioned window — day counts are bounded per user, so the
    * window partition can never outgrow a task. Ties for the longest
    * streak break toward the LATEST start (max_by struct).
    */
  def winStreak(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val rn = row_number().over(Window.partitionBy("user_id").orderBy("d"))
    val isl = days.withColumn("g",
      datediff(col("d"), lit("2024-01-01").cast("date")) - rn)
    val streaks = isl
      .groupBy(col("user_id"), col("g"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
    streaks
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest"),
        // exported as the ISO string — the engine-portable date form
        max_by(col("start_d"), struct(col("len"), col("start_d")))
          .cast("string").as("longest_start"))
      .orderBy("user_id")
  }

  /** Session count along the GAP dial — the tuning-curve stance applied
    * to sessionization (the gap threshold is the one free parameter
    * every sessionizer ships, and the dial answers "how much does the
    * choice matter"). The one-pass identity: session boundaries at gap g
    * are exactly the inter-event deltas > g, and deltas don't move with
    * g — so ONE lag window computes the per-user delta stream and every
    * gap is a conditional count over it; 3 gaps cost the same as 1.
    * n_sessions(g) = n_users + #(delta > g).
    */
  def winSessionGapSweep(
      events: DataFrame, gapsMin: Seq[Int] = Seq(5, 30, 120)): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val deltas = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
    val aggs = gapsMin.map { g =>
      (coalesce(sum(when(col("prev_us").isNotNull &&
        col("ts_us") - col("prev_us") > g * 60L * 1000000L, 1L)), lit(0L)) +
        countDistinct(col("user_id"))).as(s"s$g")
    } ++ Seq(count(lit(1)).as("n_events"))
    val one = deltas.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(gapsMin.map(g => struct(
        lit(g).as("gap_min"), col(s"s$g").as("n_sessions"),
        expr(s"(n_events * 1000) DIV s$g").as("events_per_session_milli"))): _*))
        .as("r"))
      .select(col("r.gap_min").as("gap_min"),
        col("r.n_sessions").as("n_sessions"),
        col("r.events_per_session_milli").as("events_per_session_milli"))
      .orderBy("gap_min")
  }

  def sessionize(events: DataFrame): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        min(col("event_id")).as("first_event"))
      .orderBy("user_id", "session_seq")
  }

  /** Period-over-period change per user: value deltas and percent change
    * vs the previous event (lag + arithmetic in one keyed window) — the
    * derived-metric shape of monitoring/trend pipelines. First event per
    * user has null change (no prior period).
    */
  /** NTILE banding — equal-frequency bucket assignment per group (the
    * SQL-standard way to band entities into quartiles for tiering or
    * stratified sampling). Bucket sizes differ by at most one (leading
    * buckets absorb the remainder — both engines implement the standard
    * rule); the compound (price, key) order makes assignment
    * tie-deterministic, so the entry oracle-pairs exactly. One shuffle
    * on the partition key, like every keyed window here.
    */
  def ntileBands(orders: DataFrame, n: Int = 4): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(
      col("o_orderkey"), col("o_orderpriority"),
      round(col("o_totalprice"), 2).as("price"),
      ntile(n).over(w).as("band"))
      .orderBy("o_orderkey")
  }

  def pctChange(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value"), 4).as("v"))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .select(
        col("user_id"), col("event_id"), col("v"),
        round(col("v") - col("prev_v"), 4).as("delta"),
        // null when the base is 0 (ANSI division) or absent (first event)
        round(when(col("prev_v") =!= 0,
          (col("v") - col("prev_v")) / abs(col("prev_v")) * 100), 4).as("pct_change"))
      .orderBy("user_id", "event_id")
  }

  /** Forward-fill over a sparse time series (`last` with ignoreNulls in a
    * running frame): every 3rd event carries a reading, the rest inherit
    * the most recent one per user — the gap-fill step of sensor/metric
    * pipelines. Leading nulls (before a user's first reading) stay null.
    * Values are rounded BEFORE filling so fills propagate exact values.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_id") % 3 === 0, round(col("value"), 4)).as("v_sparse"))
      .withColumn("v_filled", last(col("v_sparse"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("v_sparse"), col("v_filled"))
      .orderBy("user_id", "event_id")
  }

  /** Linear interpolation over a masked per-user series — the resample
    * step a time-series feature pipeline runs where `gapFill` would
    * smear stale values: every 3rd event keeps its value (gapFill's
    * sparsity rule), the rest interpolate linearly in EVENT TIME between
    * the nearest kept neighbors; edges clamp to the nearest kept value.
    * The masked truth is known, so the entry emits its own absolute
    * error — self-auditing interpolation.
    *
    * Shape: four frame-bounded values from TWO window specs sharing one
    * (partition, order) — one exchange + one sort total, arithmetic
    * map-side.
    */
  def winInterpolate(events: DataFrame): DataFrame = {
    val wB = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val keptTs = when(col("v_sparse").isNotNull, col("ts_us"))
    val interp =
      when(col("v_sparse").isNotNull, col("v_sparse"))
        .when(col("pv").isNull, col("nv"))
        .when(col("nv").isNull, col("pv"))
        .when(col("nt") === col("pt"), col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv")) *
          ((col("ts_us") - col("pt")).cast("double") /
            (col("nt") - col("pt")).cast("double")))
    events
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value"), 4).as("v_true"),
        when(col("event_id") % 3 === 0, round(col("value"), 4)).as("v_sparse"))
      .withColumn("pv", last(col("v_sparse"), ignoreNulls = true).over(wB))
      .withColumn("pt", last(keptTs, ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("v_sparse"), ignoreNulls = true).over(wF))
      .withColumn("nt", first(keptTs, ignoreNulls = true).over(wF))
      .withColumn("v_interp", round(interp, 4))
      .withColumn("abs_err", round(abs(col("v_interp") - col("v_true")), 4))
      .select("user_id", "event_id", "v_sparse", "v_interp", "abs_err")
      .orderBy("user_id", "event_id")
  }

  /** Top-k per group: 3 highest-value orders per customer. Keyed window +
    * rank filter — the per-group analogue of TakeOrderedAndProject (which
    * only exists for GLOBAL top-k). Tie-broken on the unique orderkey.
    */
  def topkPerGroup(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Frame-scoped COUNT DISTINCT — Spark rejects `count(DISTINCT …)` in
    * windows outright, so it is COMPOSED the win_median_sliding way:
    * frame-bounded `collect_list` (≤ 8 elements by the frame spec, never
    * data-scaled) + codegen'd `array_distinct`/`size`. The rolling
    * distinct-type count over the last 8 events is the classic
    * fraud/bot-behavior feature (how varied is this user's recent
    * activity). One shuffle on user_id; frame eval partition-local.
    */
  def distinctSliding(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("n_types_8",
        size(array_distinct(collect_list(col("event_type")).over(w))))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("n_types_8"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Order-statistic window aggregate — exact rolling MEDIAN over a
    * sliding 4-row frame per user (the robust rolling baseline a metrics
    * feed wants where one outlier wrecks a rolling MEAN). Spark rejects
    * `median` in a framed window (INVALID_WINDOW_SPEC_FOR_AGGREGATION_
    * FUNC), so the order statistic is COMPOSED: `collect_list` gathers
    * the ≤4-element frame — bounded by the frame spec, so the per-row
    * array never scales with data — and codegen'd array ops
    * (`array_sort` + `element_at`) take the middle. One shuffle on
    * user_id; frame evaluation is partition-local; the (ts, event_id)
    * ordering fixes frame contents so both engines see identical sets.
    */
  def medianSliding(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    val sorted = array_sort(collect_list(col("value")).over(w))
    val n = size(sorted)
    val half = (n / 2).cast("int")
    val med = when(n % 2 === 1, element_at(sorted, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(sorted, half) + element_at(sorted, half + 1)) / 2.0)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rolling_median", round(med, 6))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("rolling_median"))
      .orderBy("user_id", "ts_us", "event_id")
  }
}
