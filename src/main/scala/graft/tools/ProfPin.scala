package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the r16 result-pin question on the
  * iterative graph ops: the r16-hardening form pinned the final frame
  * with an EAGER `localCheckpoint()` then released every level persist;
  * the candidate (labelPropagation's release-intermediates-keep-final
  * form) keeps the final level's persist — already materialized by the
  * loop's own count() — as the pin and skips the extra checkpoint job.
  * Both leave ≤1 cached frame per call (the lifecycle spec); the
  * difference is one eager sort+cache pass per call.
  *
  * Times both forms for bfsLevels and sssp in ONE JVM/window,
  * alternating order across rounds to cancel warm-up bias.
  *
  * Usage: ProfPin [sfDir] [rounds]
  */
object ProfPin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.tables.Tables.lineitem(spark, sfDir)
    val edges = graft.operators.GraphOps.repeatEdgesTable(
      li, "/tmp/graft_warehouse", inputTag = Some(sfDir))
    val wedges = graft.operators.GraphOps.weightedEdgesTable(
      li, "/tmp/graft_warehouse", inputTag = Some(sfDir))
    edges.count(); wedges.count()

    def bfs(checkpointPin: Boolean, maxHops: Int = 4): DataFrame = {
      val und = edges.select(col("a").as("u"), col("b").as("v"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
        .persist()
      val src = und.agg(least(min(col("u")), min(col("v"))).as("node"))
      val cached = Seq.newBuilder[DataFrame]
      var visited = src.select(col("node"), lit(0L).as("hops")).persist()
      cached += visited
      visited.count()
      var frontier = visited.select(col("node"))
      for (i <- 1 to maxHops) {
        val next = und.join(frontier.select(col("node").as("u")), Seq("u"))
          .select(col("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .persist()
        cached += next
        visited = visited
          .unionByName(next.select(col("node"), lit(i.toLong).as("hops")))
          .persist()
        cached += visited
        visited.count()
        frontier = next.select(col("node"))
      }
      if (checkpointPin) {
        val out = visited.orderBy("node")
        try out.localCheckpoint() finally {
          und.unpersist(); cached.result().foreach(_.unpersist())
        }
      } else {
        val fin = visited
        und.unpersist()
        cached.result().filter(_ ne fin).foreach(_.unpersist())
        fin.orderBy("node")
      }
    }

    def sssp(checkpointPin: Boolean, iters: Int = 4,
             costScale: Long = 1000000L): DataFrame = {
      val sym = wedges.select(col("a").as("u"), col("b").as("v"), col("wt"))
        .unionByName(wedges.select(col("b").as("u"), col("a").as("v"),
          col("wt")))
        .withColumn("cost", call_function("div", lit(costScale), col("wt")))
        .persist()
      val cached = Seq.newBuilder[DataFrame]
      cached += sym
      var dist = sym.agg(min(col("u")).as("node"))
        .select(col("node"), lit(0L).as("dist"))
        .persist()
      cached += dist
      dist.count()
      for (_ <- 1 to iters) {
        val relax = sym
          .join(dist.select(col("node").as("u"), col("dist").as("du")),
            Seq("u"))
          .select(col("v").as("node"), (col("du") + col("cost")).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .persist()
        cached += dist
        dist.count()
      }
      if (checkpointPin) {
        val out = dist.orderBy("node")
        try out.localCheckpoint() finally cached.result().foreach(_.unpersist())
      } else {
        val fin = dist
        cached.result().filter(_ ne fin).foreach(_.unpersist())
        fin.orderBy("node")
      }
    }

    // markov A/B: `typesOffTrans=false` is the pre-r16-opt form (the
    // type count runs the window+cnt pipeline WITHOUT filling trans's
    // cache, so the final action pays the whole pipeline again);
    // `true` derives the count through the persisted trans.
    def markov(typesOffTrans: Boolean, iters: Int = 3): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val events = graft.tables.Tables.events(spark, sfDir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = events
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
      val cnt = pairs.groupBy(col("prev_type").as("src"),
          col("event_type").as("dst"))
        .agg(count(lit(1)).as("n"))
      val outTot = cnt.groupBy(col("src")).agg(sum(col("n")).as("out_n"))
      val trans = cnt.join(broadcast(outTot), Seq("src")).persist()
      val types =
        if (typesOffTrans) trans.select(col("src").as("event_type")).distinct()
        else outTot.select(col("src").as("event_type"))
      val nTypes = types.count()
      var v = types.withColumn("val", lit(1000000000L / nTypes))
      for (_ <- 1 to iters) {
        v = trans.join(broadcast(v.select(col("event_type").as("src"),
            col("val"))), Seq("src"))
          .select(col("dst").as("event_type"),
            expr("(val * n) DIV out_n").as("m"))
          .groupBy(col("event_type"))
          .agg(sum(col("m")).as("val"))
      }
      val out = v.select(col("event_type"), col("val").as("stat_ppb"))
        .orderBy("event_type")
      try out.localCheckpoint() finally trans.unpersist()
    }

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      spark.catalog.clearCache()
      println(f"[profpin] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(df: => DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (r <- 1 to rounds) {
      if (r % 2 == 1) {
        t(s"bfs ckpt  r$r")(run(bfs(true)))
        t(s"bfs keep  r$r")(run(bfs(false)))
        t(s"sssp ckpt r$r")(run(sssp(true)))
        t(s"sssp keep r$r")(run(sssp(false)))
        t(s"mkv old   r$r")(run(markov(false)))
        t(s"mkv new   r$r")(run(markov(true)))
      } else {
        t(s"bfs keep  r$r")(run(bfs(false)))
        t(s"bfs ckpt  r$r")(run(bfs(true)))
        t(s"sssp keep r$r")(run(sssp(false)))
        t(s"sssp ckpt r$r")(run(sssp(true)))
        t(s"mkv new   r$r")(run(markov(true)))
        t(s"mkv old   r$r")(run(markov(false)))
      }
    }
    spark.stop()
  }
}
