package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.JoinOps

/** The interval-overlap join's grid decomposition, proven against the
  * naive theta join on random interval sets: the cell posting, the
  * equi-join, and the overlap-start-cell dedup rule together must be
  * semantically invisible at every input — the fixed-fixture oracle
  * checks one distribution, the property checks many (clustered starts,
  * zero-length-adjacent, cell-straddling).
  */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(r.passed, r.status.toString)
  }

  // the operator derives intervals from an orders-shaped frame; generate
  // random (orderkey, custkey, orderdate) rows and hand them to BOTH the
  // grid operator and an in-Spark naive theta join
  private def ordersLike(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("o_orderkey", "o_custkey", "day_off")
      .select(col("o_orderkey"), col("o_custkey"),
        date_add(lit("1995-01-01").cast("date"), col("day_off"))
          .cast("timestamp_ntz").as("o_orderdate"))

  private def naive(rows: Seq[(Long, Long, Int)]): Set[(Long, Long, Long)] = {
    val iv = rows.map { case (id, ck, off) =>
      (id, ck % 100L, off.toLong, off.toLong + 1L + id % 14L)
    }
    val a = iv.filter(_._1 % 2 == 0)
    val b = iv.filter(_._1 % 2 != 0)
    (for {
      (aid, at, as_, ae) <- a
      (bid, bt, bs, be) <- b
      if at == bt && as_ < be && bs < ae
    } yield (aid, bid, math.min(ae, be) - math.max(as_, bs))).toSet
  }

  test("property: grid overlap join equals the naive theta join on random intervals") {
    val genRow = for {
      id <- Gen.choose(0L, 400L)
      ck <- Gen.choose(0L, 300L)
      off <- Gen.choose(0, 120) // several cells' worth of time axis
    } yield (id, ck, off)
    // distinct ids: the operator treats o_orderkey as a row identity
    val genRows = Gen.listOfN(120, genRow).map(_.distinctBy(_._1))
    check(Prop.forAll(genRows) { rows =>
      val got = JoinOps.intervalOverlap(ordersLike(rows))
        .select("a_id", "b_id", "overlap_days")
        .as[(Long, Long, Long)].collect().toSet
      got == naive(rows)
    })
  }

  test("asof tolerance: in-window click matches, stale click is NO match, boundary inclusive") {
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def at(mins: Long) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
    val events = Seq(
      // user 1: click exactly AT the tolerance bound (inclusive -> match)
      (1L, at(-1440), "click", 10L),
      (1L, at(0), "purchase", 11L),
      // user 2: click one minute past the bound -> stale, no match
      (2L, at(-1441), "click", 20L),
      (2L, at(0), "purchase", 21L),
      // user 3: fresh click; an older one exists but latest wins
      (3L, at(-2000), "click", 30L),
      (3L, at(-5), "click", 31L),
      (3L, at(0), "purchase", 32L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("value", lit(0.0))
    val out = graft.operators.JoinOps.asofTolerance(events, tolMinutes = 1440)
      .select("purchase_id", "click_id", "matched")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2))).toSeq
    assert(out === Seq(
      (11L, Some(10L), true),   // boundary click matches (<= tolerance)
      (21L, None, false),       // stale-only user: no match at all
      (32L, Some(31L), true)))  // latest fresh click wins over older
  }

  test("pair meeting in two cells is emitted exactly once") {
    // ids chosen so both intervals straddle the 16-day cell boundary:
    // a = [14, 14+1+2) = [14,17), b = [15, 15+1+1) = [15,17) — overlap
    // [15,17) spans cells 0 and 1
    val rows = Seq((2L, 7L, 14), (1L, 7L, 15))
    val out = JoinOps.intervalOverlap(ordersLike(rows))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 1L, 2L)), s"got $out")
  }
}
