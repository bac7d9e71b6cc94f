package graft.tools

/** Scratch A/B harness for the session join-strategy question (guide
  * §3.1): AQE's SMJ→SHJ runtime rewrite
  * (`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`) and the
  * static planner preference (`spark.sql.join.preferSortMergeJoin`)
  * are both RUNTIME SQL confs, so the A/B can flip them per run inside
  * ONE JVM/session — no cross-window noise. Alternating order per
  * round cancels warm-up bias.
  *
  * Usage: ProfJoin <q1,q2,...> [sfDir] [rounds]
  */
object ProfJoin {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = ToolSession.build()
    graft.SparkEntry.warmLayouts(spark, sfDir)
    spark.catalog.clearCache()
    val modes: Seq[(String, () => Unit)] = Seq(
      "base" -> (() => {
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      }),
      "shj " -> (() => {
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "134217728")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      }),
      "psmj" -> (() => {
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      }))
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // one untimed warm pass per query (JIT/codegen)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      for (r <- 1 to rounds) {
        val order = if (r % 2 == 1) modes else modes.reverse
        for ((m, set) <- order) {
          set()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[profjoin] $n $m r$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.catalog.clearCache()
        }
      }
      modes.head._2() // restore base
    }
    spark.stop()
  }
}
