package graft

/** Driver-contract invariants: every declared oracle pairs with a query,
  * every query executes on real (smallest-sf) data, and the flagship
  * entry point is non-empty — the reference's "ensure consistent
  * insertion" validation (/root/reference/README.md:33, 103–106) applied
  * to our own harness surface.
  */
class ContractSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("Bench headline names all exist in queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline entries missing from queries: $missing")
  }

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 with a non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        assert(df.schema.nonEmpty, s"$name: empty schema")
        df.count() // forces full execution
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
