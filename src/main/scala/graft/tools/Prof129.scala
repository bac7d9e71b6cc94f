package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the q129 bfsLevels co-partition A/B
  * (round 15, verdict item 4): the shipped form persists the
  * symmetrized edges as-shuffled; the candidate applies
  * landmarkCloseness's `repartition(col("u")).persist()` so every
  * level's frontier join finds the big side already distributed by the
  * join key and only the frontier shuffles. Times both at RunOne ×3
  * steady in one JVM/window, shipped first and candidate first in
  * alternating order to cancel warm-up bias.
  *
  * Usage: Prof129 [sfDir] [maxHops] [scale]
  *
  * `scale` > 1 unions N id-strided disjoint copies of the edge set
  * (each copy a disconnected component with identical structure — the
  * ScaleUp construction applied to edges): BFS from the min node only
  * explores copy 0, so the per-level join's BIG side grows ×N while
  * the frontier stays local — exactly the regime where big-side
  * co-partitioning could pay.
  */
object Prof129 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val maxHops = if (args.length > 1) args(1).toInt else 4
    val scale = if (args.length > 2) args(2).toInt else 1
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.operators.GraphOps.repeatEdgesTable(
      graft.tables.Tables.lineitem(spark, sfDir), "/tmp/graft_warehouse",
      inputTag = Some(sfDir))
    val edges =
      if (scale <= 1) base
      else {
        val stride = 10000000L
        val copies = spark.range(0, scale).select(col("id").as("copy"))
        base.crossJoin(copies)
          .select((col("a") + col("copy") * stride).as("a"),
            (col("b") + col("copy") * stride).as("b"))
          .repartition(32)
      }
    edges.count() // layout built/loaded outside the timed window

    def bfs(coPartition: Boolean, eagerNext: Boolean = true): DataFrame = {
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
      val und = (if (coPartition) sym.repartition(col("u")) else sym)
        .persist()
      val src = und.agg(least(min(col("u")), min(col("v"))).as("node"))
      var visited = src.select(col("node"), lit(0L).as("hops")).persist()
      visited.count()
      var frontier = visited.select(col("node"))
      for (i <- 1 to maxHops) {
        val next = und.join(frontier.select(col("node").as("u")), Seq("u"))
          .select(col("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .persist()
        // eagerNext=false drops the per-level next.count(): the
        // following visited.count() materializes next THROUGH the
        // union anyway, so the extra job may be pure scheduling cost
        if (eagerNext) next.count()
        visited = visited
          .unionByName(next.select(col("node"), lit(i.toLong).as("hops")))
          .persist()
        visited.count()
        frontier = next.select(col("node"))
      }
      visited.orderBy("node")
    }

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      spark.catalog.clearCache()
      println(f"[prof129] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (round <- 1 to 3) {
      if (round % 2 == 1) {
        t(s"shipped   r$round")(bfs(false).write.format("noop").mode("overwrite").save())
        t(s"coPart    r$round")(bfs(true).write.format("noop").mode("overwrite").save())
        t(s"lazyNext  r$round")(bfs(false, eagerNext = false).write.format("noop").mode("overwrite").save())
      } else {
        t(s"lazyNext  r$round")(bfs(false, eagerNext = false).write.format("noop").mode("overwrite").save())
        t(s"coPart    r$round")(bfs(true).write.format("noop").mode("overwrite").save())
        t(s"shipped   r$round")(bfs(false).write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
