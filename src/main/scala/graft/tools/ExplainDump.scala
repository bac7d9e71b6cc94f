package graft.tools

import java.nio.file.{Files, Paths}

/** Dev harness: dump `.explain("formatted")` for named queries (or
  * `all`) to `<outDir>/<query>_<suffix>.txt` — the plan evidence the
  * optimization rounds commit under `plans/`. Not part of the driver
  * contract.
  *
  * Usage: ExplainDump <outDir> <suffix> <sfDir> <q1,q2,...|all> [warm]
  *
  * Plans are captured on the bench-grade session (ToolSession) after an
  * optional warmLayouts pass, so a layout-served query's plan shows the
  * serve-time scan (the shape the bench times), not the ingest build.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val names: Seq[String] =
      if (args(3) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    Files.createDirectories(outDir)
    val spark = ToolSession.build()
    if (args.contains("warm")) graft.SparkEntry.warmLayouts(spark, sfDir)
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        // same string explain("formatted") prints, captured instead
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // cap committed evidence at 6000 lines (r16 advice: a
        // keep-final-persist plan inlines nested InMemoryRelations per
        // BFS level — q129's dump was 44k lines for a diff whose useful
        // content is the top few hundred; 6000 keeps the widest real
        // operator list, q85's ~3k lines, intact)
        val lines = txt.split("\n", -1)
        val capped =
          if (lines.length <= 6000) txt
          else lines.take(6000).mkString("\n") +
            s"\n... [ExplainDump: truncated ${lines.length - 6000} lines]\n"
        Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          capped.getBytes("UTF-8"))
        println(s"[explain] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $n failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
