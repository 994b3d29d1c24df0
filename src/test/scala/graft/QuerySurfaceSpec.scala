package graft

/** Smoke + shape checks for every SparkEntry query at sf0.001.
  * Exact-value correctness is checked against the DuckDB oracle by the
  * driver (and locally by tools/local_check.py); here we assert the
  * queries run, return rows, and stay deterministic across two runs.
  */
class QuerySurfaceSpec extends SparkSuite {

  // q7's anti-join may legitimately return 0 rows at tiny scale.
  private val mayBeEmpty = Set("q7_customers_without_orders")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys all exist in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query carries an oracle — none silently skips the correctness gate") {
    // a query without an oracle only gets the driver's weak rows-only
    // check; the whole surface is intentionally oracle-complete, so a
    // new operator missing its oracleSql entry is a bug, not a choice
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("q1 is deterministic across two executions") {
    val name = "q1_pricing_summary"
    val a = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
