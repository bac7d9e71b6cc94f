package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Skew/bucketing scale patterns: salted join semantics and bucketed
  * co-located joins (no shuffle in the plan).
  */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result on skewed data") {
    val rnd = new scala.util.Random(3)
    // 90% of rows hit key 1 (the skew), rest spread over 2..5
    val large = (1 to 5000).map { i =>
      (if (rnd.nextDouble() < 0.9) 1L else 2L + rnd.nextInt(4), i.toLong)
    }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"))
      .toDF("k", "label")
    val plain = large.join(small, "k")
      .select($"k", $"payload", $"label").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = RelationalOps.saltedJoin(large, small, "k", salts = 8)
      .select($"k", $"payload", $"label").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted === plain)
    assert(plain.size === 5000)
  }

  test("J1 enrichment join plans as a broadcast-hash join (no shuffle)") {
    // Plan-shape regression guard (the q58/q92/q225 pruning-assert
    // stance applied to the §2 joins): the reference's enrichment join
    // is per-event against a live-bearer-bounded dimension — a shuffle
    // of the fact side would be the 100 TB scale bug. Asserts the hint
    // actually lands as BroadcastHashJoin and the fact side sees no
    // hashpartitioning Exchange.
    val events = (1 to 500).map(i => (i.toLong % 50L, s"e$i"))
      .toDF("user_id", "payload")
    val dim = (0 until 50).map(i => (i.toLong, s"c$i"))
      .toDF("c_custkey", "name")
    val joined = RelationalOps.enrich(events, dim)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"J1 should plan as BroadcastHashJoin:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"J1 fact side should not shuffle:\n$plan")
    assert(joined.count() === 500)
  }

  test("J4 geofence plans as a broadcast nested-loop join") {
    import graft.operators.GeofenceOp
    val points = Seq((1L, 50.85, 4.35), (2L, 0.0, 0.0))
      .toDF("id", "lat", "lng")
    val joined = GeofenceOp.geofence(points)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"J4 should plan as BroadcastNestedLoopJoin:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"J4 must never plan as a CartesianProduct:\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_a")
      (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("pageRank: one exact integer superstep on a hand-computed star") {
    import graft.operators.GraphOps
    // encoded star: customers c1 (node 2) and c2 (node 4) both touch
    // supplier s1 (node 3). Symmetrized degrees: 2→1, 4→1, 3→2; n=3.
    // base = 1e9 div 3 = 333333333; after one superstep:
    //   r(s1) = (15·base + 85·(base+base)) div 100 = 616666666
    //   r(c*) = (15·base + 85·(base div 2)) div 100 = 191666666
    val edges = Seq((2L, 3L), (4L, 3L)).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, iters = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("s", 1L, 616666666L),
      ("c", 1L, 191666666L),
      ("c", 2L, 191666666L)))
    // rank mass is conserved up to per-node floor loss: n nodes lose
    // < 100 ppb each to the two floor divisions
    val total = out.map(_._3).sum
    assert(total <= 1000000000L && total > 1000000000L - 3 * 100L)
  }

  test("triangleCount: degree-ordered wedges count each triangle once") {
    import graft.operators.GraphOps
    // K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 new
    // triangles) — includes equal-degree ties, which exercise the
    // (degree, id) orientation tiebreak.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = GraphOps.triangleCount(edges).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === (5L, 7L, 4L))
  }

  test("interpolated quartiles: percentile_cont hand-check, n=1 degenerate") {
    import graft.operators.RelationalOps
    // Validate via the wired query shape with a crafted mini "orders ⋈
    // customer": segment A has values 10, 20, 30, 40 -> p25 = 17.5,
    // p50 = 25, p75 = 32.5; segment B has a single value (all three
    // quartiles = it).
    val orders = Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0),
      (4L, 1L, 40.0), (5L, 2L, 7.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    // re-derive through the same formula the operator uses
    val joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    def interp(qnum: Int) = {
      val pos = (col("n") - 1) * qnum
      val idx = expr(s"((n - 1) * $qnum) DIV 4")
      val rem = pos - idx * 4
      val lo = element_at(col("vs"), (idx + 1).cast("int"))
      val hi = element_at(col("vs"), least(idx + 2, col("n")).cast("int"))
      round(lo + rem.cast("double") / 4.0 * (hi - lo), 4)
    }
    val out = joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("o_totalprice"))).as("vs"))
      .select(col("c_mktsegment"), interp(1).as("p25"), interp(2).as("p50"),
        interp(3).as("p75"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("A", 17.5, 25.0, 32.5),
      ("B", 7.0, 7.0, 7.0)))
  }

  test("kCore: pendant chain peels away round by round, core is stable") {
    import graft.operators.GraphOps
    // K4 on {1,2,3,4} (a true 3-core) with a pendant chain 4-5-6:
    // peel 1 drops 6 (deg 1) and 5 keeps deg... 5 has deg 2 < 3 -> both
    // 5 and 6 drop in round 1; the K4 survives every round.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val out = GraphOps.kCore(edges, k = 3L, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 4L, 6L), (2L, 4L, 6L), (3L, 4L, 6L)))
  }

  test("labelPropagation: barbell communities converge to component minima") {
    import graft.operators.GraphOps
    // two weight-5 triangles {1,2,3} / {4,5,6} bridged by a weight-1
    // edge 3-4: after 3 synchronous rounds every node carries its
    // triangle's minimum id (bridge too weak to leak labels across);
    // round 1 exercises the (score desc, label asc) tie rule on every
    // node.
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L), (3L, 4L, 1L))
      .toDF("a", "b", "wt")
    val out = GraphOps.labelPropagation(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)))
  }

  test("sssp: integer hop costs relax round by round, horizon bounds reach") {
    import graft.operators.GraphOps
    // path 1-2-3-4 with weights 2,4,2 (costs 500000, 250000, 500000)
    // plus a heavy shortcut 1-5 (wt 10, cost 100000); source = min = 1
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 4L), (3L, 4L, 2L),
      (1L, 5L, 10L)).toDF("a", "b", "wt")
    val at2 = GraphOps.sssp(edges, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(at2.toSeq === Seq((1L, 0L), (2L, 500000L), (3L, 750000L),
      (5L, 100000L)))
    val at4 = GraphOps.sssp(edges, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(at4.toSeq === Seq((1L, 0L), (2L, 500000L), (3L, 750000L),
      (4L, 1250000L), (5L, 100000L)))
  }

  test("frequentTriples: support counted per distinct order, a-priori agrees with brute force") {
    import graft.operators.GraphOps
    // orders: {1,2,3} ×2 (frequent triple), {1,2,4}, {5,6} — and a dup
    // line (order 10 lists part 1 twice) that must not inflate support
    val li = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L),
      (13L, 5L), (13L, 6L)
    ).toDF("l_orderkey", "l_partkey")
    val out = GraphOps.frequentTriples(li, minSupport = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 2L)))
  }

  test("triangleCount: hub star has zero triangles, no wedge blowup") {
    import graft.operators.GraphOps
    // star centered on 0: naive id-ordered wedging at the hub would
    // generate C(50,2) candidate pairs; degree ordering points every
    // edge INTO the hub so the apex expansion is empty.
    val edges = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    val out = GraphOps.triangleCount(edges).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === (51L, 50L, 0L))
  }

  test("degreeAssortativity: star is perfectly disassortative, matching is degenerate") {
    import graft.operators.GraphOps
    // star: every edge joins the degree-5 hub to a degree-1 leaf →
    // endpoint degrees are perfectly anti-correlated, r = −1
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val out = GraphOps.degreeAssortativity(star).collect().head
    assert(out.getLong(0) === 10L) // 5 edges × both orientations
    assert(out.getLong(1) === -1000000L)
    // perfect matching: all degrees 1 → zero variance → NULL guard
    val matching = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val deg = GraphOps.degreeAssortativity(matching).collect().head
    assert(deg.isNullAt(1))
  }

  test("bfsLevels: exact hop distances; unreachable and beyond-horizon absent") {
    import graft.operators.GraphOps
    // path 1-2-3-4-5-6 plus chord 1-3, plus disconnected pair 10-11.
    // From source 1: hops = 1:0, 2:1, 3:1 (chord), 4:2, 5:3, 6:4.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 3L), (10L, 11L)).toDF("a", "b")
    val out3 = GraphOps.bfsLevels(edges, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out3 === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val out4 = GraphOps.bfsLevels(edges, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out4(6L) === 4L && !out4.contains(10L) && !out4.contains(11L))
  }

  test("iterative graph ops release their level caches: at most the " +
       "pinned result survives a call (r16 lifecycle rule)") {
    import graft.operators.GraphOps
    val sc = spark.sparkContext
    // each op used to leave its per-level persists cached for the
    // session (bfsLevels at maxHops=4: ~10 frames); now everything is
    // released once the result is pinned — at most ONE new persistent
    // RDD (the localCheckpoint of the small result) may remain.
    def newPersistent(f: => Unit): Int = {
      val before = sc.getPersistentRDDs.keySet
      f
      sc.getPersistentRDDs.keySet.diff(before).size
    }
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 3L), (2L, 4L)).toDF("a", "b")
    val wedges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L), (3L, 4L, 1L))
      .toDF("a", "b", "wt")
    val dedges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    assert(newPersistent(GraphOps.bfsLevels(edges, maxHops = 4).collect()) <= 1)
    assert(newPersistent(GraphOps.kCore(edges, k = 2L, iters = 3).collect()) <= 1)
    assert(newPersistent(GraphOps.labelPropagation(wedges, iters = 3).collect()) <= 1)
    assert(newPersistent(GraphOps.sssp(wedges, iters = 3).collect()) <= 1)
    assert(newPersistent(GraphOps.hits(dedges, iters = 2, k = 3).collect()) <= 1)
  }

  test("iterative result pin is size-gated: cache below " +
       "spark.graft.graph.pinMaxRows, lineage-free checkpoint above " +
       "(r17, verdict item 3)") {
    import graft.operators.GraphOps
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 3L), (2L, 4L)).toDF("a", "b")
    val wedges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L), (3L, 4L, 1L))
      .toDF("a", "b", "wt")
    def runAll(): Seq[Seq[Seq[Any]]] = Seq(
      GraphOps.bfsLevels(edges, maxHops = 4),
      GraphOps.sssp(wedges, iters = 3),
      GraphOps.labelPropagation(wedges, iters = 3),
    ).map { df =>
      // checkpointed results have truncated lineage: the analyzed plan
      // bottoms out in an ExistingRDD/LogicalRDD, never a LocalRelation
      // join chain; cached results keep their full logical lineage
      val out = df.collect().map(_.toSeq).toSeq
      assert(out.nonEmpty); out
    }
    // below the gate (default 4M rows ≫ these graphs): cache-pinned —
    // results identical, at most one surviving cached frame per call
    // (the lifecycle test above). Above... force the other branch with
    // a zero gate: every pin converts to localCheckpoint, results must
    // be IDENTICAL and nothing may stay in the cache registry.
    val below = runAll()
    spark.catalog.clearCache() // drop the below-gate cache pins
    spark.conf.set("spark.graft.graph.pinMaxRows", "0")
    val above = try {
      val r = runAll()
      // localCheckpoint registers the checkpoint RDD itself; allow it
      // but assert no CACHED DataFrame (CacheManager entry) survives
      assert(spark.sharedState.cacheManager.isEmpty,
        "checkpoint branch must not leave CacheManager entries")
      r
    } finally spark.conf.unset("spark.graft.graph.pinMaxRows")
    assert(above === below)
  }

  test("brandSkyline: window filter equals the brute-force dominance set") {
    import graft.operators.RelationalOps
    // deterministic synthetic parts across 3 brands, with deliberate
    // price ties and duplicate (price, size) points
    val parts = (1 to 120).map { i =>
      (i.toLong, s"B${i % 3}", (i * 37 % 11) + 1, 900.0 + (i * 53 % 17))
    }.toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
    val tmp = java.nio.file.Files.createTempDirectory("skyline").toString
    parts.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = RelationalOps.brandSkyline(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // brute force: survives iff nothing in-brand dominates it
    val rows = parts.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    val want = rows.filter { case (k, b, sz, p) =>
      !rows.exists { case (k2, b2, sz2, p2) =>
        k2 != k && b2 == b && p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz)
      }
    }.map { case (k, b, _, _) => (b, k) }.toSet
    assert(got === want && got.nonEmpty)
  }

  test("weightedMedianPrice: threshold rule on a hand-computed brand") {
    import graft.operators.RelationalOps
    // one brand, prices 10/20/30 with weights 1/2/1: total 4, the
    // cumulative weight reaches 2 (=half) at price 20 → wmedian 20.
    // second brand: single part → its own price.
    val parts = Seq(
      (1L, "X", 1, 10.0), (2L, "X", 2, 20.0), (3L, "X", 1, 30.0),
      (4L, "Y", 7, 55.5)
    ).toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
    val tmp = java.nio.file.Files.createTempDirectory("wmed").toString
    parts.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val out = RelationalOps.weightedMedianPrice(spark, tmp).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("X", 20.0, 4L, 3L), ("Y", 55.5, 7L, 1L)))
  }
}
