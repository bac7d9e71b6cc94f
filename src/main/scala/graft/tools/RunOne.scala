package graft.tools


/** Dev harness: run one named query against a sf dir, print timing and
  * optionally the formatted physical plan. Not part of the driver
  * contract.
  *
  * Usage: RunOne <queryName> <sfDir> [explain] [repeat]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val repeat = args.find(_.startsWith("x")).map(_.drop(1).toInt).getOrElse(1)
    // bench-grade session (ToolSession): readings here are anchors for
    // the graded bench, so the perf-critical knobs must match it
    val spark = ToolSession.build()
    if (args.contains("warm")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.warmLayouts(spark, sfDir)
      println(f"[runone] warmLayouts: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // comma-separated names share one JVM/session — same-window
    // ratios for scale rehearsals (JVM warmup lands in the first
    // query's run1, steady runs compare honestly).
    for (n1 <- name.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = graft.SparkEntry.queries(n1)
      for (i <- 1 to repeat) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (doExplain && i == 1) df.explain("formatted")
        df.write.format("noop").mode("overwrite").save()
        println(f"[runone] $n1 run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
