package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityOps

/** QualityOps — planted-violation fixtures: a validation suite is only
  * trustworthy if it demonstrably CATCHES each failure class it claims
  * to check, so every expectation here gets a row built to fail it.
  */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("quality_expectations counts each planted violation class") {
    val orders = Seq(
      (1L, Option(10L), "O", 100.0, ts("1997-01-01 00:00:00")),
      (1L, Option(11L), "F", 500000.0, ts("1999-01-01 00:00:00")), // dup key + >400k
      (2L, None, "X", 50.0, ts("1998-01-01 00:00:00")), // null custkey + bad status
      (3L, Option(99L), "P", 60.0, ts("2000-01-01 00:00:00"))) // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val customer = Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
    val lineitem = Seq(
      (1L, 1.0, 0.05, Option(ts("1997-02-01 00:00:00"))),
      (2L, 99.0, 0.5, None)) // qty out of range + discount out of range + null date
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_shipdate")
    val got = QualityOps.qualityExpectations(orders, customer, lineitem)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(got(("unique", "orders.o_orderkey")) === ((4L, 1L, 0)))
    assert(got(("not_null", "orders.o_custkey")) === ((4L, 1L, 0)))
    assert(got(("accepted_values", "orders.o_orderstatus")) === ((4L, 1L, 0)))
    assert(got(("max_value", "orders.o_totalprice")) === ((4L, 1L, 0)))
    // orphan: custkey 99 has no customer; the NULL custkey also fails RI
    assert(got(("ref_integrity", "orders.o_custkey->customer")) === ((4L, 2L, 0)))
    assert(got(("range", "lineitem.l_discount")) === ((2L, 1L, 0)))
    assert(got(("range", "lineitem.l_quantity")) === ((2L, 1L, 0)))
    assert(got(("not_null", "lineitem.l_shipdate")) === ((2L, 1L, 0)))
  }

  test("quality_expectations passes a clean suite on the real corpus checks") {
    val d = sf0001
    val got = QualityOps.qualityExpectations(
      Tables.orders(spark, d), Tables.customer(spark, d), Tables.lineitem(spark, d))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(4)).toMap
    // structural checks hold on the fixture; the tight SLA bound fails by
    // design (the suite must be able to show a failure)
    assert(got(("unique", "orders.o_orderkey")) === 1)
    assert(got(("ref_integrity", "orders.o_custkey->customer")) === 1)
    assert(got(("max_value", "orders.o_totalprice")) === 0)
  }

  test("quality_profile_diff reports per-column metric deltas from one scan") {
    val orders = Seq(
      (1L, "O", "1-URGENT", 100.0, ts("1997-01-01 00:00:00")),
      (2L, "F", "2-HIGH", 200.0, ts("1997-06-01 00:00:00")),
      (3L, "O", "1-URGENT", 400.0, ts("1999-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice",
        "o_orderdate")
    val got = QualityOps.qualityProfileDiff(orders)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(("_table", "row_count")) === ((2.0, 1.0, -1.0)))
    assert(got(("o_totalprice", "mean")) === ((150.0, 400.0, 250.0)))
    assert(got(("o_orderstatus", "n_distinct")) === ((2.0, 1.0, -1.0)))
  }

  test("quality_drift_psi: identical halves score exactly zero, shift scores > 0") {
    // same bucket histogram on both sides of the date split -> every
    // p_a == p_b exactly -> every micro-unit term is 0
    val same = Seq(
      (1L, 10000.0, ts("1997-01-01 00:00:00")),
      (2L, 10000.0, ts("1999-01-01 00:00:00")),
      (3L, 260000.0, ts("1997-01-01 00:00:00")),
      (4L, 260000.0, ts("1999-01-01 00:00:00")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val psiSame = QualityOps.qualityDriftPsi(same)
      .filter(col("bucket") === -1).select("psi").as[Double].head()
    assert(psiSame === 0.0)
    // all mass moves buckets across the split -> positive drift
    val shifted = Seq(
      (1L, 10000.0, ts("1997-01-01 00:00:00")),
      (2L, 490000.0, ts("1999-01-01 00:00:00")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val psiShift = QualityOps.qualityDriftPsi(shifted)
      .filter(col("bucket") === -1).select("psi").as[Double].head()
    assert(psiShift > 0.0)
  }

  test("quality_drift_psi emits the full 10-bucket spine even for sparse data") {
    val sparse = Seq((1L, 10000.0, ts("1997-01-01 00:00:00")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val rows = QualityOps.qualityDriftPsi(sparse)
    assert(rows.count() === 11) // 10 buckets + summary
    assert(rows.filter(col("bucket") >= 0).count() === 10)
  }

  test("quality_anomaly: planted burst flagged, hand-computed median/MAD/z") {
    // five real days with counts 3,4,4,5,6 plus the planted 8x-max spike
    // day (48) DERIVED as max(day)+30 = 2024-02-04: median of
    // [3,4,4,5,6,48] = 4.5, MAD = median(1.5,0.5,0.5,0.5,1.5,43.5) = 1.0
    val counts = Seq(3, 4, 4, 5, 6)
    val rows = counts.zipWithIndex.flatMap { case (k, d0) =>
      (1 to k).map(i => ((d0 + 1) * 100L + i, ts(f"2024-01-0${d0 + 1} 12:00:$i%02d")))
    }
    val events = rows.toDF("event_id", "ts")
    val got = QualityOps.qualityAnomaly(events)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getInt(6)))).toMap
    assert(got("2024-02-04") === ((4.5, 1.0, 87L, 2L, 1)),
      "the planted 8x burst must be flagged")
    assert(got("2024-01-05") === ((4.5, 1.0, 3L, 2L, 0)),
      "a mild above-median day must not be flagged")
    assert(got("2024-01-01")._5 === 0)
  }

  test("quality_anomaly: spike day never collides with a real day key") {
    // the r12 ADVICE scenario — a fixture spanning the spike's would-be
    // calendar date. With the derived max(day)+30 spike, every day key in
    // the output is distinct regardless of the fixture's date span.
    val events = Seq(
      (1L, ts("2024-02-28 10:00:00")), (2L, ts("2024-03-01 10:00:00")),
      (3L, ts("2024-03-01 11:00:00")), (4L, ts("2024-03-02 10:00:00")))
      .toDF("event_id", "ts")
    val days = QualityOps.qualityAnomaly(events)
      .select("day").as[String].collect().toSeq
    assert(days.distinct.size === days.size,
      s"duplicate day key in the anomaly output: $days")
    assert(days.contains("2024-04-01"), // 2024-03-02 + 30
      s"derived spike day missing: $days")
  }

  test("quality_cusum: reflection identity equals the recursive fold; planted shift alarms") {
    // 10 flat days at n=100; the operator itself plants 5 days at 2×max
    val rows = (1 to 10).flatMap(d =>
      (1 to 100).map(i => ((d * 1000 + i).toLong, ts(f"2024-01-$d%02d 10:00:00"))))
    val events = rows.toDF("event_id", "ts")
    val got = QualityOps.qualityCusum(events).collect()
    assert(got.length === 15, "10 real + 5 planted days")
    // replay the RECURSIVE definition S_t = max(0, S_{t-1} + n·1e6 − μ − κ)
    // over the same day order — the window form must match it exactly
    val mu = got.map(_.getLong(1)).sum * 1000000L / 15L
    val kap = mu / 10L
    var s = 0L
    val recursive = got.map { r =>
      s = math.max(0L, s + r.getLong(1) * 1000000L - mu - kap); s
    }
    assert(got.map(_.getLong(2)).toSeq === recursive.toSeq,
      "prefix-sum − running-min must equal the recursive CUSUM")
    // no alarm on the flat prefix; the planted shift must alarm
    assert(got.take(10).forall(_.getInt(3) === 0), s"false alarm: ${got.toSeq}")
    assert(got.takeRight(5).exists(_.getInt(3) === 1),
      s"planted level shift not detected: ${got.toSeq}")
  }

  test("text_zipf_audit: a crafted 1/rank corpus fits slope ≈ −1; a flat corpus ≈ 0") {
    // word_i appears floor(2000/i) times for i = 1..40 — exact Zipf
    val zipf = (1 to 40).flatMap { i =>
      Seq.fill(2000 / i)(s"w$i")
    }.grouped(50).zipWithIndex.map { case (ws, id) =>
      (id.toLong, ws.mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val z = graft.operators.TextOps.textZipfAudit(zipf).head()
    assert(z.getLong(0) === 40L)
    assert(z.getLong(1) > -1100000L && z.getLong(1) < -900000L,
      s"Zipf corpus must fit slope ≈ −1e6: ${z.getLong(1)}")
    // flat corpus: every word equally frequent → slope ≈ 0
    val flat = (1 to 40).flatMap(i => Seq.fill(50)(s"w$i"))
      .grouped(50).zipWithIndex.map { case (ws, id) => (id.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val f = graft.operators.TextOps.textZipfAudit(flat).head()
    assert(math.abs(f.getLong(1)) < 50000L,
      s"flat corpus must fit slope ≈ 0: ${f.getLong(1)}")
  }

  test("sink_quality_gate routes the corrupted batch whole; clean batches stay clean") {
    val got = graft.sources.EtlOps.sinkQualityGate(spark, sf0001).collect()
    assert(got.length === 4)
    val quarantined = got.filter(_.getString(0) === "quarantine")
    assert(quarantined.map(_.getInt(1)).toSeq === Seq(2),
      "exactly the planted batch must quarantine")
    assert(quarantined.head.getLong(3) > 0L,
      "the quarantined batch must carry the planted nulls")
    got.filter(_.getString(0) === "clean").foreach { r =>
      assert(r.getLong(3) === 0L, s"clean table leaked nulls: $r")
    }
  }

  test("quality_report: six headline metrics, planted signals surface") {
    val d = sf0001
    val got = QualityOps.qualityReport(
      Tables.orders(spark, d), Tables.customer(spark, d),
      Tables.lineitem(spark, d), Tables.events(spark, d))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size === 6)
    assert(got(("expectations", "n_failing_checks")) >= 1.0,
      "the deliberately-tight SLA bound must surface in the card")
    assert(got(("anomaly", "n_outlier_days")) >= 1.0,
      "the planted burst day must surface in the card")
    assert(got(("drift", "psi_total")) >= 0.0)
  }

  test("agg_histogram_quantile: hand-computed interpolation and exact-arm parity") {
    // two values in adjacent buckets: the p50 estimate lands exactly on
    // the exact percentile (both 5000); p95 interpolates 90% into
    // bucket 1 while the exact arm lerps between the two raw values
    val orders = Seq((1L, 2500.0), (2L, 7500.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = graft.operators.AggOps.aggHistogramQuantile(orders)
      .collect().map(r => r.getDouble(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0.5) === ((5000.0, 5000.0, 0.0)))
    assert(got(0.95) === ((9500.0, 7250.0, 2250.0)))
  }

  test("quality_freshness flags types beyond the 20-minute SLA") {
    val events = Seq(
      (1L, ts("2024-01-30 23:00:00"), "stale_type"),
      (2L, ts("2024-01-30 23:55:00"), "fresh_type"),
      (3L, ts("2024-01-30 23:59:00"), "freshest"))
      .toDF("event_id", "ts", "event_type")
    val got = QualityOps.qualityFreshness(events)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getInt(4)))).toMap
    assert(got("freshest") === ((0L, 0)))
    assert(got("fresh_type") === ((4L * 60L * 1000000L, 0)))
    assert(got("stale_type") === ((59L * 60L * 1000000L, 1)))
  }

  test("quality_anomaly_grouped: every slice's planted spike flags as an outlier") {
    val got = QualityOps.qualityAnomalyGrouped(
      graft.Tables.events(spark, sf0001)).collect()
    assert(got.nonEmpty)
    val types = got.map(_.getString(0)).distinct
    assert(types.length >= 2, "grouped monitor must cover multiple slices")
    types.foreach { t =>
      val rows = got.filter(_.getString(0) == t)
      val spike = rows.maxBy(_.getLong(2))
      assert(spike.getInt(7) === 1, s"type $t: planted 8x spike not flagged: $spike")
    }
  }
}
