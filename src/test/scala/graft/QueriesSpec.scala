package graft

/** Regression guard over the whole driver contract: every SparkEntry
  * query runs at sf0.001, is internally deterministic (two runs collect
  * identical results — catches unordered output, float nondeterminism,
  * or driver-state leakage), and every query has either an oracle or a
  * documented reason not to.
  */
class QueriesSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query runs, is non-degenerate, and is run-to-run deterministic") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size >= 40)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val r1 = fn(spark, sfDir).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val r2 = fn(spark, sfDir).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      assert(r1 === r2, s"$name not deterministic across runs")
      assert(fn(spark, sfDir).columns.nonEmpty, s"$name has no columns")
      spark.catalog.clearCache()
    }
  }

  test("oracle coverage: every query is oracled except the documented approx ones") {
    // engine-specific sketches (quantile digest, HLL) cannot hash-match
    // a DuckDB rerun — these two are rows-only BY DESIGN, everything
    // else must carry oracle SQL
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled === Set("q32_iqr_outliers_approx", "q57_approx_distinct"))
    // and no orphan oracle entries
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
