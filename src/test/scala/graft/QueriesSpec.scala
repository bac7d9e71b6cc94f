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

  test("q58 as wired: source filter lives ONLY in PartitionFilters") {
    // the real q58 pipeline (not the synthetic layout in
    // BucketedOpsSpec) — a future cast/expression wrapped around
    // `source` would silently demote directory pruning to a per-row
    // data filter; that must fail tests, not just read slow in a bench.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q58_partition_pruned")(spark, sfDir)
      val scans = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"no file scan found:\n${df.queryExecution}")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"source filter did not reach PartitionFilters:\n${df.queryExecution}")
      assert(scans.forall(_.dataFilters.isEmpty),
        s"source filter leaked into per-row dataFilters:\n${df.queryExecution}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
