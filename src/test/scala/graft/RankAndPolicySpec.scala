package graft

import graft.operators.{AuditOps, DedupOp, KMeansOp, TextOps}

/** Constructed-data tests for the round-8 additions: centroid
  * silhouette (q163), Spearman rank correlation (q164), n-gram
  * diversity (q165), the composite filter policy (q166), and
  * asymmetric containment pairs (q167). Each test plants a case with a
  * hand-computed exact answer — the corpus-level hash gate proves
  * engine parity, these prove the arithmetic.
  */
class RankAndPolicySpec extends SparkSuite {
  import spark.implicits._

  test("silhouette: tight point high, equidistant point zero, exact ppm means") {
    // centers are vec_id 1 (0,0) and 2 (10,0); point 3 at (1,0) has
    // a=1, b=9 → s=8/9; point 4 at (5,0) is equidistant → a=b=5 → s=0
    val emb = Seq(
      (1L, Seq(0.0, 0.0)),
      (2L, Seq(10.0, 0.0)),
      (3L, Seq(1.0, 0.0)),
      (4L, Seq(5.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = KMeansOp.silhouette(emb, Seq(1L, 2L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // cluster 1: s values {1000000, 888889, 0} → halfUp(1888889/3) = 629630
    assert(out(1L) === ((3L, 629630L, 0L, 1000000L)))
    assert(out(2L) === ((1L, 1000000L, 1000000L, 1000000L)))
  }

  test("spearman: monotone → 1, anti-monotone → −1, ties keep ±1 when aligned") {
    val li = Seq(
      // grp A: monotone but wildly non-linear — Spearman sees 1.0
      ("A", 1.0, 0.01), ("A", 2.0, 1.00), ("A", 3.0, 100.0), ("A", 4.0, 9999.0),
      // grp B: aligned ties on both sides — still 1.0 with average ranks
      ("B", 1.0, 0.05), ("B", 1.0, 0.05), ("B", 2.0, 0.09),
      // grp C: strictly decreasing — −1.0
      ("C", 1.0, 0.30), ("C", 2.0, 0.20), ("C", 3.0, 0.10)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = AuditOps.spearman(li).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("A") === 1000000L)
    assert(out("B") === 1000000L)
    assert(out("C") === -1000000L)
  }

  test("spearman: BIGINT and DECIMAL moment branches agree, and the " +
       "BIGINT gate bound has worst-case headroom") {
    // The count gate (SpearmanBigintMaxRows) picks the moment-sum type;
    // DuckDB's side is branch-free (HUGEINT), so parity needs exactly
    // this: both branches produce identical output on one frame.
    val li = Seq(
      ("A", 1.0, 0.01), ("A", 2.0, 1.00), ("A", 2.0, 100.0),
      ("A", 4.0, 9999.0), ("B", 1.0, 0.05), ("B", 1.0, 0.05),
      ("B", 2.0, 0.09), ("C", 1.0, 0.30), ("C", 2.0, 0.20)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val bigint = AuditOps.spearman(li, bigintMaxRows = Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val decimal = AuditOps.spearman(li, bigintMaxRows = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bigint.toSeq === decimal.toSeq)
    // Worst case at the bound: every row in ONE group, every doubled
    // rank maximal (2n) → Σ(2r̄)² ≤ 4n³ must stay under 2⁶³.
    val b = BigInt(AuditOps.SpearmanBigintMaxRows)
    assert(4 * b.pow(3) < BigInt(2).pow(63))
  }

  test("ngramDiversity: all-same vs all-distinct tokens, exact ppm") {
    val docs = Seq(
      (1L, "rep", "a a a a"),      // 1/4, 1/3, 1/2 distinct ratios
      (2L, "uni", "w x y z")       // all distinct → 1.0 at every n
    ).toDF("doc_id", "source", "text")
    val out = TextOps.ngramDiversity(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("rep", 1L)) === 250000L)
    assert(out(("rep", 2L)) === 333333L)
    assert(out(("rep", 3L)) === 500000L)
    assert(out(("uni", 1L)) === 1000000L)
    assert(out(("uni", 2L)) === 1000000L)
    assert(out(("uni", 3L)) === 1000000L)
  }

  test("filterPolicy: each rule fails exactly its planted doc") {
    val good = (1 to 40).map(i => s"tok$i").mkString(" ") // 40 toks, len 4-5ish
    // planted failures, one per rule, same source
    val tooShort = (1 to 5).map(i => s"tok$i").mkString(" ")
    val longToks = (1 to 40).map(i => s"verylongtoken$i").mkString(" ")
    val noStop = good // no stopwords at all → fails r3
    // 36× one 5-char token + 4 stopwords: length/len rules pass, but
    // uniq = 2/40 (fails r4) and 36 duplicate bigrams (fails r5)
    val repeated = ("zzzzz " * 36 + "the the the the").trim
    val docs = Seq(
      (1L, "s", good + " the a of"),   // 43 toks incl 3 stopwords → passes all
      (2L, "s", tooShort),             // fails r1 (too short)
      (3L, "s", longToks),             // fails r2 (mean len > 5)
      (4L, "s", noStop),               // fails r3 (0 stopwords)
      (5L, "s", repeated)              // fails r4 + r5
    ).toDF("doc_id", "source", "text")
    val r = TextOps.filterPolicy(docs).collect().head
    assert(r.getString(0) === "s")
    assert(r.getLong(1) === 5L)            // n_docs
    assert(r.getLong(2) === 4L)            // pass_len (doc 2 fails)
    assert(r.getLong(3) === 4L)            // pass_tok_len (doc 3 fails)
    assert(r.getLong(4) === 2L)            // pass_stop (docs 1 and 5 only)
    assert(r.getLong(5) === 4L)            // pass_uniq (doc 5 fails)
    assert(r.getLong(6) === 4L)            // pass_rep (doc 5 fails)
    assert(r.getLong(7) === 1L)            // n_pass: only doc 1
    assert(r.getLong(8) === 200000L)       // pass_ppm = 1/5
  }

  test("tokenChi2Drift: identical distributions zero, disjoint vocab exact") {
    // both sources match the corpus distribution exactly → χ² = 0
    val same = Seq((1L, "sA", "x y"), (2L, "sB", "x y"))
      .toDF("doc_id", "source", "text")
    val z = operators.TextOps.tokenChi2Drift(same).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(z === Map("sA" -> 0L, "sB" -> 0L))
    // disjoint vocabularies: per source χ² = (2−1)²/1 + 1 missing = 2.0
    val disj = Seq((1L, "sA", "x x"), (2L, "sB", "y y"))
      .toDF("doc_id", "source", "text")
    val d = operators.TextOps.tokenChi2Drift(disj).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(d === Map("sA" -> 2000000L, "sB" -> 2000000L))
  }

  test("equiDepthHistogram keeps tie groups together at a boundary") {
    // values 1¢×3, 2¢×3, 3¢×2 with 2 buckets: starts 0,3,6 of N=8 →
    // buckets 1,1,2 — the 2¢ tie group does NOT straddle the boundary
    val rows = Seq.fill(3)(0.01) ++ Seq.fill(3)(0.02) ++ Seq.fill(2)(0.03)
    val li = rows.toDF("l_extendedprice")
    val out = operators.RelationalOps.equiDepthHistogram(li, buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((6L, 1L, 2L, 9L)))   // 3×1¢ + 3×2¢
    assert(out(2L) === ((2L, 3L, 3L, 6L)))   // 2×3¢
  }

  test("landmarkCloseness on a path graph: exact harmonic sums") {
    // path 1-2-3-4-5, landmarks = two smallest nodes {1, 2}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = operators.GraphOps.landmarkCloseness(edges, nLandmarks = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 1L, 1000000L)))           // d(1,2)=1
    assert(out(2L) === ((1L, 1L, 1000000L)))           // d(2,1)=1
    assert(out(3L) === ((2L, 1L, 1500000L)))           // 1/2 + 1/1
    assert(out(4L) === ((2L, 2L, 833333L)))            // 1/3 + 1/2
    assert(out(5L) === ((2L, 3L, 583333L)))            // 1/4 + 1/3
  }

  test("joinKeySkew: planted hot key yields exact share, ratio, salt") {
    // 10 rows: key 1 × 6, keys 2..5 × 1 each → n=10, n_keys=5, max=6
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val r = operators.AuditOps.joinKeySkew(Seq(("t.k", df, "k")), parts = 4)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((10L, 5L, 6L)))
    assert(r.getLong(4) === 600000L)   // top1 share 0.6
    assert(r.getLong(5) === 3000000L)  // max/mean = 6/2 = 3.0
    assert(r.getLong(6) === 3L)        // ceil(6·4/10) = 3 salts
  }

  test("dedupSensitivity: cumulative pairs/docs/tokens across deciles") {
    // pair (3,4): 10 shared of 12+12 shingles → J = 10/14 ≈ 0.7143
    // pair (1,2): identical → J = 1.0 (capped into decile 9)
    val c = (1 to 14).map(i => s"c$i")
    val docs = Seq(
      (1L, "z1 z2 z3 z4 z5"),
      (2L, "z1 z2 z3 z4 z5"),
      (3L, c.mkString(" ")),
      (4L, (c.take(12) ++ Seq("e1", "e2")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = operators.DedupOp.dedupSensitivity(docs).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0.9) === ((1L, 2L, 10L)))   // only the identical pair
    assert(out(0.7) === ((2L, 4L, 38L)))   // cumulative: both pairs
    assert(out.size === 2)
  }

  test("mannKendall and cusum on constructed hourly series") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // one event per hour → the hourly mean IS the value (centi-cents)
    def ev(vals: Seq[Double], typ: String) =
      vals.zipWithIndex.map { case (v, i) =>
        (i.toLong * 3600000L, typ, v)
      }
    val rows = ev(Seq(1.0, 2.0, 2.0, 3.0), "mk") ++
      ev(Seq(0.0, 0.0, 0.0, 10.0, 10.0, 10.0), "cu")
    val events = rows.toDF("ms", "event_type", "value")
      .select(timestamp_millis(col("ms")).as("ts"), col("event_type"),
        col("value"))
    val mk = operators.EventOps.mannKendallTrend(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // [1,2,2,3]: 5 concordant, 0 discordant, 1 tie → S = 5
    assert(mk("mk") === ((4L, 5L, 0L, 1L, 5L)))
    // cu: lower median of [0,0,0,10,10,10] = 0 → S = [0,0,0,1e5,2e5,3e5]
    // (centi-cents), runmin 0 → C = S: peak 3e5, no alarms at 1e7
    val cu = operators.EventOps.cusumShifts(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cu("cu") === ((6L, 0L, 300000L, 0L)))
    // a DOWN-shift first: med 10 → S dips to −3e5 and recovers; the
    // running-min identity must clamp C at 0 through the dip
    val events2 = ev(Seq(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0), "dn")
      .toDF("ms", "event_type", "value")
      .select(timestamp_millis(col("ms")).as("ts"), col("event_type"),
        col("value"))
    val dn = operators.EventOps.cusumShifts(events2).collect().head
    // med = 10 (4th of 7 sorted) = 1e5 centi-cents → S walks to −3e5
    // then stays; C = S − min(0, runmin) = 0 everywhere
    assert(dn.getLong(2) === 100000L && dn.getLong(3) === 0L &&
      dn.getLong(4) === 0L)
  }

  test("containmentPairs flags a subset-copy that Jaccard misses") {
    val big = (1 to 20).map(i => s"w$i").mkString(" ")   // 18 shingles
    val sub = (1 to 5).map(i => s"w$i").mkString(" ")    // 3 shingles ⊂ big
    val docs = Seq((1L, big), (2L, sub)).toDF("doc_id", "text")
    val cont = DedupOp.containmentPairs(docs, 0.8).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(2) === 18L && r.getLong(3) === 3L)
    assert(r.getDouble(4) === 1.0)
    // the same pair's Jaccard is 3/18 — far below the 0.5 near-dup bar
    assert(DedupOp.ngramJaccard(docs, 0.5).collect().isEmpty)
  }
}
