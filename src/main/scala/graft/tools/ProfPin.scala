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
  * Grew into the round's general same-window A/B harness: every form
  * pair/triple is compiled into ONE JVM and alternated within a
  * window, order flipped between rounds to cancel warm-up bias.
  * Arms: bfs/sssp (pin strategy), mkv (markov double-pass), asc
  * (assoc nOrders forms), fk (one-pass audit), locf (repartition /
  * persist forms), tri (q115 persist variants), peak (q80 persist
  * variants). Verdicts recorded in OPTIMIZATION_r16.md.
  *
  * Usage: ProfPin [sfDir] [rounds] [op,op,...]
  */
object ProfPin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val ops: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("bfs", "sssp", "mkv", "asc")
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

    // assoc A/B (q178): `persistLi=false` is the pre-r16-opt form —
    // the eager nOrders count runs the lineitem scan+distinct pipeline
    // WITHOUT caching it, so the final plan's item rollup pays the
    // whole pipeline again; `true` persists li so the count fills the
    // cache the rollup then reads (the markovStationary class).
    // modes: "old" = eager count reads through the UNPERSISTED pair
    // distinct (runs scan+pair-distinct twice per call); "persist" =
    // cache the pair distinct (markov-style); "direct" = count
    // distinct l_orderkey straight off lineitem (same value — a
    // basket's id appears in every one of its pair rows — skipping
    // the pair-distinct exchange in the eager job entirely).
    def assoc(mode: String, minSupport: Long = 2L): DataFrame = {
      import graft.functions.DetAgg.{halfUpDiv, ratio}
      val li0 = li.select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk")).distinct()
      val liF = if (mode == "persist") li0.persist() else li0
      val nOrders =
        if (mode == "direct")
          li.select(col("l_orderkey")).distinct().count()
        else liF.select(col("ok")).distinct().count()
      val item = liF.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pair = wedges
        .select(col("a"), col("b"), col("wt").as("n_ab"))
        .where(col("n_ab") >= minSupport)
      val sym = pair.select(col("a"), col("b"), col("n_ab"))
        .unionByName(pair.select(col("b").as("a"), col("a").as("b"),
          col("n_ab")))
      val out = sym
        .join(broadcast(item.select(col("pk").as("a"),
          col("n_item").as("na"))), Seq("a"))
        .join(broadcast(item.select(col("pk").as("b"),
          col("n_item").as("nb"))), Seq("b"))
        .select(col("a"), col("b"), col("n_ab"),
          ratio(col("n_ab"), lit(nOrders), 6).as("support"),
          ratio(col("n_ab"), col("na"), 6).as("confidence"),
          halfUpDiv(col("n_ab") * lit(nOrders) * 1000000L,
            col("na") * col("nb")).as("lift_ppm"))
        .orderBy("a", "b")
      try out.localCheckpoint()
      finally { if (mode == "persist") { liF.unpersist(); () } }
    }

    // fk A/B (q95): `onePass=false` is the pre-r16-opt form — per
    // relation, a counts-only aggregate over the child PLUS a LEFT
    // ANTI join into a second aggregate (two full child scans),
    // cross-joined back; `true` is the one-pass LEFT-join-with-marker
    // form shipped in AuditOps.fkIntegrity.
    def fk(onePass: Boolean): DataFrame = {
      val rels = graft.operators.AuditOps.defaultRels(spark, sfDir)
      rels.map { r =>
        val keyed = r.child.select(col(r.childKey).cast("long").as("__k"))
        val parents = r.parent
          .select(col(r.parentKey).cast("long").as("__k")).distinct()
        if (onePass) {
          keyed.join(parents.withColumn("__p", lit(1L)), Seq("__k"), "left")
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)),
                lit(0L)).as("n_nulls"),
              coalesce(sum(when(col("__k").isNotNull && col("__p").isNull,
                1L).otherwise(0L)), lit(0L)).as("n_orphans"))
            .select(lit(r.name).as("relation"),
              col("n_rows"), col("n_nulls"), col("n_orphans"))
        } else {
          val orphans = keyed.where(col("__k").isNotNull)
            .join(parents, Seq("__k"), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
          keyed.agg(count(lit(1)).as("n_rows"),
              coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)),
                lit(0L)).as("n_nulls"))
            .crossJoin(orphans)
            .select(lit(r.name).as("relation"),
              col("n_rows"), col("n_nulls"), col("n_orphans"))
        }
      }.reduce(_ unionByName _).orderBy("relation")
    }

    // locf A/B (q82): `singleExchange=false` is the pre-r16-opt form
    // (each step demands its own distribution); `true` repartitions by
    // user_id once up front so every downstream window/agg/join reuses
    // the one exchange (EventOps.locfResample's shipped form).
    // modes: "old" = per-step distributions (pre-r16); "repart" = one
    // up-front repartition(user_id) (the shipped candidate); "prst" =
    // repart + persist the obs frame (it feeds BOTH the grid subtree
    // and the join side — the plan otherwise duplicates the
    // scan+window subtree), pinned via localCheckpoint + unpersist.
    def locf(mode: String, stepMs: Long = 3600000L): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val events = graft.tables.Tables.events(spark, sfDir)
      val base =
        if (mode != "old")
          events.select(col("user_id"), col("ts"), col("event_id"),
            col("value")).repartition(col("user_id"))
        else events
      val withHr = base.withColumn("hr",
        expr(s"unix_millis(ts) div $stepMs"))
      val wLast = Window.partitionBy(col("user_id"), col("hr"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val obs0 = withHr.withColumn("rn", row_number().over(wLast))
        .where(col("rn") === 1)
        .select(col("user_id"), col("hr"), col("value").as("v"))
      val obs = if (mode == "prst") obs0.persist() else obs0
      val spans = obs.groupBy(col("user_id"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      val grid = spans.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
      val wRun = Window.partitionBy(col("user_id")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val out = grid.join(obs, Seq("user_id", "hr"), "left")
        .select(col("user_id"), (col("hr") * stepMs).as("hr_ms"),
          last(col("v"), ignoreNulls = true).over(wRun).as("locf_value"),
          when(col("v").isNotNull, 1L).otherwise(0L).as("is_obs"))
        .orderBy("user_id", "hr_ms")
      if (mode == "prst")
        try out.localCheckpoint() finally { obs.unpersist(); () }
      else out
    }

    // tri A/B (q115): the a-priori triple miner consumes `li` (basket
    // distinct) THREE times and `pairs` (the per-order pair expansion)
    // TWICE in one plan. modes: "base" = recompute everything (current
    // shipped form); "li" = persist li; "pairs" = persist pairs;
    // "both" = persist both. Pinned via localCheckpoint + release.
    def tri(mode: String, minSupport: Long = 2L): DataFrame = {
      val li0 = li.select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk")).distinct()
      val liF = if (mode == "li" || mode == "both") li0.persist() else li0
      val pairs0 = liF.as("l").join(liF.as("r"),
          col("l.ok") === col("r.ok") && col("l.pk") < col("r.pk"))
        .select(col("l.ok").as("ok"), col("l.pk").as("a"),
          col("r.pk").as("b"))
      val pairs = if (mode == "pairs" || mode == "both") pairs0.persist()
        else pairs0
      val freqP = pairs.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("w")).where(col("w") >= minSupport)
        .select(col("a"), col("b"))
      val candPairs = pairs.join(freqP, Seq("a", "b"), "left_semi").as("p")
      val cand = candPairs.join(liF.as("c"),
          col("p.ok") === col("c.ok") && col("c.pk") > col("p.b"))
        .select(col("p.ok").as("ok"), col("p.a").as("a"),
          col("p.b").as("b"), col("c.pk").as("cc"))
        .join(freqP.select(col("a"), col("b").as("cc")),
          Seq("a", "cc"), "left_semi")
        .join(freqP.select(col("a").as("b"), col("b").as("cc")),
          Seq("b", "cc"), "left_semi")
      val out = cand.groupBy(col("a"), col("b"), col("cc"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= minSupport)
        .select(col("a").as("part_a"), col("b").as("part_b"),
          col("cc").as("part_c"), col("support"))
        .orderBy("part_a", "part_b", "part_c")
      if (mode == "base") out
      else try out.localCheckpoint() finally {
        if (mode == "li" || mode == "both") liF.unpersist()
        if (mode == "pairs" || mode == "both") pairs.unpersist()
        ()
      }
    }

    // peak A/B (q80): the sessionize window chain feeds `deltas`,
    // which is consumed by the partials agg AND the boundary join —
    // and `offsets` is consumed by boundaryHours AND gapHours, so the
    // sessionize subtree appears ~3x in the plan. An earlier-round
    // persist A/B on this op was negative; re-measured post-locf.
    // modes: "base" = shipped recompute; "sess" = persist sessionize
    // output; "dlt" = persist deltas; pin via localCheckpoint.
    def peak(mode: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val events = graft.tables.Tables.events(spark, sfDir)
      val hourMs = 3600000L
      val sess0 = graft.operators.EventOps.sessionize(events)
        .select(col("start_ms"), col("end_ms"))
      val sess = if (mode == "sess") sess0.persist() else sess0
      val deltas0 = sess.select(explode(array(
          struct(col("start_ms").as("t"), lit(1L).as("d")),
          struct(col("end_ms").as("t"), lit(-1L).as("d")))).as("b"))
        .select(col("b.t").as("t"), col("b.d").as("d"))
        .withColumn("hr", expr(s"t div $hourMs"))
      val deltas = if (mode == "dlt") deltas0.persist() else deltas0
      val partials = deltas.groupBy(col("hr")).agg(sum(col("d")).as("p"))
      val wCarry = Window.orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = partials.select(col("hr"),
        coalesce(sum(col("p")).over(wCarry), lit(0L)).as("carry"))
      val wInHour = Window.partitionBy(col("hr"))
        .orderBy(col("t"), col("d").desc)
      val boundaryHours = deltas.join(broadcast(offsets), Seq("hr"))
        .withColumn("run", col("carry") + sum(col("d")).over(wInHour))
        .groupBy(col("hr"))
        .agg(greatest(max(col("run")), max(col("carry"))).as("peak"),
          count(lit(1)).as("n_boundaries"))
      val wLead = Window.orderBy(col("hr"))
      val gapHours = offsets
        .withColumn("next_hr", lead(col("hr"), 1).over(wLead))
        .withColumn("next_carry", lead(col("carry"), 1).over(wLead))
        .where(col("next_carry") > 0 && col("next_hr") > col("hr") + 1)
        .select(explode(sequence(col("hr") + 1, col("next_hr") - 1))
          .as("hr"), col("next_carry").as("peak"),
          lit(0L).as("n_boundaries"))
      val out = boundaryHours.unionByName(gapHours)
        .select((col("hr") * hourMs).as("hr_ms"), col("peak"),
          col("n_boundaries"))
        .orderBy("hr_ms")
      if (mode == "base") out
      else try out.localCheckpoint() finally {
        if (mode == "sess") sess.unpersist()
        if (mode == "dlt") deltas.unpersist()
        ()
      }
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
        if (ops("bfs")) { t(s"bfs ckpt  r$r")(run(bfs(true)))
          t(s"bfs keep  r$r")(run(bfs(false))) }
        if (ops("sssp")) { t(s"sssp ckpt r$r")(run(sssp(true)))
          t(s"sssp keep r$r")(run(sssp(false))) }
        if (ops("mkv")) { t(s"mkv old   r$r")(run(markov(false)))
          t(s"mkv new   r$r")(run(markov(true))) }
        if (ops("asc")) { t(s"asc old   r$r")(run(assoc("old")))
          t(s"asc prst  r$r")(run(assoc("persist")))
          t(s"asc drct  r$r")(run(assoc("direct"))) }
        if (ops("fk")) { t(s"fk  old   r$r")(run(fk(false)))
          t(s"fk  new   r$r")(run(fk(true))) }
        if (ops("locf")) { t(s"locf old  r$r")(run(locf("old")))
          t(s"locf rep  r$r")(run(locf("repart")))
          t(s"locf prst r$r")(run(locf("prst"))) }
        if (ops("tri")) { t(s"tri base  r$r")(run(tri("base")))
          t(s"tri li    r$r")(run(tri("li")))
          t(s"tri pairs r$r")(run(tri("pairs")))
          t(s"tri both  r$r")(run(tri("both"))) }
        if (ops("peak")) { t(s"peak base r$r")(run(peak("base")))
          t(s"peak sess r$r")(run(peak("sess")))
          t(s"peak dlt  r$r")(run(peak("dlt"))) }
      } else {
        if (ops("bfs")) { t(s"bfs keep  r$r")(run(bfs(false)))
          t(s"bfs ckpt  r$r")(run(bfs(true))) }
        if (ops("sssp")) { t(s"sssp keep r$r")(run(sssp(false)))
          t(s"sssp ckpt r$r")(run(sssp(true))) }
        if (ops("mkv")) { t(s"mkv new   r$r")(run(markov(true)))
          t(s"mkv old   r$r")(run(markov(false))) }
        if (ops("asc")) { t(s"asc drct  r$r")(run(assoc("direct")))
          t(s"asc prst  r$r")(run(assoc("persist")))
          t(s"asc old   r$r")(run(assoc("old"))) }
        if (ops("fk")) { t(s"fk  new   r$r")(run(fk(true)))
          t(s"fk  old   r$r")(run(fk(false))) }
        if (ops("locf")) { t(s"locf prst r$r")(run(locf("prst")))
          t(s"locf rep  r$r")(run(locf("repart")))
          t(s"locf old  r$r")(run(locf("old"))) }
        if (ops("tri")) { t(s"tri both  r$r")(run(tri("both")))
          t(s"tri pairs r$r")(run(tri("pairs")))
          t(s"tri li    r$r")(run(tri("li")))
          t(s"tri base  r$r")(run(tri("base"))) }
        if (ops("peak")) { t(s"peak dlt  r$r")(run(peak("dlt")))
          t(s"peak sess r$r")(run(peak("sess")))
          t(s"peak base r$r")(run(peak("base"))) }
      }
    }
    spark.stop()
  }
}
