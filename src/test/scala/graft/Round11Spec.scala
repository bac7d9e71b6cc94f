package graft

import graft.operators.{DedupOp, EventOps, GraphOps, TextOps}
import org.apache.spark.sql.functions._

/** Semantics of the round-11 block: dup-graph transitivity on a
  * triangle-plus-chain, Cochran's Q on hand-built detector frames,
  * HITS on a 2×2 bipartite graph (hand-unrolled power iteration),
  * Nelson–Aalen hazards on a crafted survival frame, and byte/token
  * ratios on ASCII documents.
  */
class Round11Spec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("dupTransitivity: triangle scores 750k ppm against 4 wedges") {
    // triangle {1,2,3} + chain 4-5-6: wedges = Σ C(deg,2) = 3·1 + 1 = 4,
    // triangles = 1 → transitivity = 3/4.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L))
      .toDF("da", "db")
    val r = DedupOp.dupTransitivity(pairs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_nodes") === 6L)
    assert(row.getAs[Long]("n_edges") === 5L)
    assert(row.getAs[Long]("n_wedges") === 4L)
    assert(row.getAs[Long]("n_triangles") === 1L)
    assert(row.getAs[Long]("transitivity_ppm") === 750000L)
  }

  test("dupTransitivity: pure chain has zero triangles, null-free zero ppm") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("da", "db")
    val row = DedupOp.dupTransitivity(pairs).collect().head
    assert(row.getAs[Long]("n_wedges") === 1L)
    assert(row.getAs[Long]("n_triangles") === 0L)
    assert(row.getAs[Long]("transitivity_ppm") === 0L)
  }

  test("cochranQ: hand-computed 3-detector disagreement") {
    // union pairs: (1,2) all three; (1,3) mh+ex; (2,3) mh; (4,5) sh.
    // C = (3,2,2), N = 7, ΣC² = 17, ΣR² = 9+4+1+1 = 15.
    // q_num = 2(3·17 − 49) = 4; q_den = 21 − 15 = 6; ppm = 666667.
    val mh = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("da", "db")
    val sh = Seq((1L, 2L), (4L, 5L)).toDF("da", "db")
    val ex = Seq((1L, 2L), (1L, 3L)).toDF("da", "db")
    val row = DedupOp.cochranQFromPairs(mh, sh, ex).collect().head
    assert(row.getAs[Long]("n_pairs") === 4L)
    assert(row.getAs[Long]("n_all3") === 1L)
    assert(row.getAs[Long]("c_minhash") === 3L)
    assert(row.getAs[Long]("c_simhash") === 2L)
    assert(row.getAs[Long]("c_exact") === 2L)
    assert(row.getAs[Long]("q_num") === 4L)
    assert(row.getAs[Long]("q_den") === 6L)
    assert(row.getAs[Long]("q_ppm") === 666667L)
  }

  test("cochranQ: unanimous detectors give Q = 0 with null ppm (den 0)") {
    val p = Seq((1L, 2L), (3L, 4L)).toDF("da", "db")
    val row = DedupOp.cochranQFromPairs(p, p, p).collect().head
    assert(row.getAs[Long]("q_num") === 0L)
    assert(row.getAs[Long]("q_den") === 0L)
    assert(row.isNullAt(row.fieldIndex("q_ppm")))
  }

  test("hits: 2x2 bipartite power iteration, hand-unrolled 3 rounds") {
    // c1(2)→s1(3), c1→s2(5), c2(4)→s1. Unrolled: a3 = (13, 8),
    // h3 = (21, 13) → authority ppm (1e6, 615384), hub ppm (1e6, 619047).
    val edges = Seq((2L, 3L), (2L, 5L), (4L, 3L)).toDF("src", "dst")
    val rows = GraphOps.hits(edges).collect()
    assert(rows.length === 4)
    val byKey = rows.map(r => (r.getAs[String]("node_type"),
      r.getAs[Long]("node_id")) -> r.getAs[Long]("score_ppm")).toMap
    assert(byKey(("s", 1L)) === 1000000L)
    assert(byKey(("s", 2L)) === 615384L) // 8e6 DIV 13
    assert(byKey(("c", 1L)) === 1000000L)
    assert(byKey(("c", 2L)) === 619047L) // 13e6 DIV 21
    // presentation order: node_type asc, score desc, id asc
    assert(rows.map(_.getAs[String]("node_type")).toSeq
      === Seq("c", "c", "s", "s"))
  }

  test("nelsonAalen: hazards are per-step exact ppb and cumulative") {
    // u1 repurchases after 2h (death), then censored 2h before corpus
    // end; u2 censored at 4h. t=2: n=3, d=1 → 1e9/3; t=4: n=1, d=0.
    val df = Seq(
      (1L, 10L, ts(0), "purchase", 1.0),
      (1L, 11L, ts(2 * 3600L), "purchase", 1.0),
      (2L, 12L, ts(0), "purchase", 1.0),
      (9L, 13L, ts(4 * 3600L), "view", 0.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val rows = EventOps.nelsonAalen(df).collect()
    assert(rows.length === 2)
    val r2 = rows(0)
    assert(r2.getAs[Long]("t_hours") === 2L)
    assert(r2.getAs[Long]("n_risk") === 3L)
    assert(r2.getAs[Long]("n_deaths") === 1L)
    assert(r2.getAs[Long]("n_censored") === 1L)
    assert(r2.getAs[Long]("h_ppb") === 333333333L)
    assert(r2.getAs[Long]("hcum_ppb") === 333333333L)
    val r4 = rows(1)
    assert(r4.getAs[Long]("t_hours") === 4L)
    assert(r4.getAs[Long]("n_risk") === 1L)
    assert(r4.getAs[Long]("n_deaths") === 0L)
    assert(r4.getAs[Long]("h_ppb") === 0L)
    assert(r4.getAs[Long]("hcum_ppb") === 333333333L)
  }

  test("lshBandPlanner: exact pairs detect with certainty, s=0.5 ladder") {
    // jaccard 1.0: s^r = 1 → detect = 1e6 for every arm.
    val sure = Seq((1L, 2L, 1.0), (3L, 4L, 1.0)).toDF("da", "db", "jaccard")
    val r1 = DedupOp.lshBandPlanner(sure).collect()
    assert(r1.length === 5)
    assert(r1.forall(_.getAs[Long]("mean_detect_ppm") === 1000000L))
    assert(r1.forall(_.getAs[Long]("n_weak") === 0L))
    // jaccard 0.5, arm (r=8, b=4): p8 = 3906 ppm, (1−p8)^4 ladder →
    // 992203 → 984467, detect = 15533 (hand-computed halfUp chain).
    val half = Seq((1L, 2L, 0.5)).toDF("da", "db", "jaccard")
    val r2 = DedupOp.lshBandPlanner(half).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("b")) -> r).toMap
    val arm84 = r2((8L, 4L))
    assert(arm84.getAs[Long]("n_pairs") === 1L)
    assert(arm84.getAs[Long]("mean_detect_ppm") === 15533L)
    assert(arm84.getAs[Long]("n_weak") === 1L)
  }

  test("clusterLangPurity: mixed cluster lands in decile 6, pure in 10") {
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"),
      (5L, "fr"), (9L, "xx")).toDF("doc_id", "lang")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("da", "db")
    val rows = DedupOp.clusterLangPurityFromPairs(docs, pairs).collect()
      .map(r => r.getAs[Long]("purity_decile") -> r).toMap
    // {1,2,3}: purity 2/3 → 666667 ppm → decile 6, 2 langs
    assert(rows(6L).getAs[Long]("n_clusters") === 1L)
    assert(rows(6L).getAs[Long]("n_docs") === 3L)
    assert(rows(6L).getAs[Long]("n_monolingual") === 0L)
    // {4,5}: monolingual → decile 10
    assert(rows(10L).getAs[Long]("n_clusters") === 1L)
    assert(rows(10L).getAs[Long]("n_docs") === 2L)
    assert(rows(10L).getAs[Long]("n_monolingual") === 1L)
    assert(rows.size === 2) // doc 9 is not in the pair graph
  }

  test("winnowDensity: repeated-token doc collapses to one fingerprint") {
    // "a a a a a a a a": 6 identical shingles → 3 full windows, 1 fp;
    // "x y z": one shingle, no full window → counted doc, 0 windows.
    val docs = Seq((1L, "s1", "a a a a a a a a"), (2L, "s1", "x y z"))
      .toDF("doc_id", "source", "text")
    val rows = TextOps.winnowDensity(docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_windows") === 3L)
    assert(r.getAs[Long]("n_fp") === 1L)
    assert(r.getAs[Long]("density_ppm") === 333333L)
  }

  test("percolationCurve: giant component shrinks as threshold rises") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.7), (3L, 4L, 0.55),
      (5L, 6L, 0.85)).toDF("da", "db", "jaccard")
    val rows = graft.operators.DedupOp.percolationCurve(pairs).collect()
      .map(r => r.getAs[Long]("threshold_pct") -> r).toMap
    assert(rows(50L).getAs[Long]("n_edges") === 4L)
    assert(rows(50L).getAs[Long]("n_components") === 2L)
    assert(rows(50L).getAs[Long]("max_comp") === 4L)
    assert(rows(50L).getAs[Long]("giant_share_ppm") === 666667L)
    assert(rows(70L).getAs[Long]("n_edges") === 3L) // 0.7 kept at 70
    assert(rows(70L).getAs[Long]("max_comp") === 3L)
    assert(rows(80L).getAs[Long]("n_components") === 2L)
    assert(rows(80L).getAs[Long]("giant_share_ppm") === 500000L)
  }

  test("simhashBitBias: single doc puts every bit at 0 or 1e6") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val rows = graft.operators.DedupOp.simhashBitBias(docs).collect()
    assert(rows.length === 60)
    assert(rows.forall { r =>
      val s = r.getAs[Long]("share_ppm")
      (s == 0L || s == 1000000L) && r.getAs[Long]("bias_ppm") == 500000L
    })
  }

  test("hapaxBySource: counts types seen once and twice within source") {
    val docs = Seq((1L, "s1", "a b a c")).toDF("doc_id", "source", "text")
    val r = TextOps.hapaxBySource(docs).collect().head
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Long]("n_hapax") === 2L)
    assert(r.getAs[Long]("n_dis") === 1L)
    assert(r.getAs[Long]("hapax_share_ppm") === 666667L)
    assert(r.getAs[Long]("ttr_ppm") === 750000L)
  }

  test("normOctaves: unit vector lands in octave 39, zero vector in 0") {
    val unit = Array.fill(64)(0.0f).updated(0, 1.0f)
    val zero = Array.fill(64)(0.0f)
    val df = Seq((1L, unit, 0), (2L, zero, 1), (3L, unit, 0))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.operators.SimilarityOp.normOctaves(df).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("octave")) -> r)
      .toMap
    // sq = (1e6)² = 1e12 ∈ [2³⁹, 2⁴⁰)
    assert(rows((0L, 39L)).getAs[Long]("n_vecs") === 2L)
    assert(rows((0L, 39L)).getAs[Long]("mean_sq") === 1000000000000L)
    assert(rows((1L, 0L)).getAs[Long]("n_vecs") === 1L)
    assert(rows((1L, 0L)).getAs[Long]("mean_sq") === 0L)
  }

  test("acfLagHistogram: period-4 energy series picks best lag 4") {
    // payload = 8 × (64 zero bytes + 64 0xFF): window energies cycle
    // 0, 8160, 16320, 8160 — exact period 4 at win=64/hop=32.
    val payload = Array.tabulate[Byte](1024)(i =>
      if ((i / 64) % 2 == 0) 0.toByte else 0xFF.toByte)
    val media = Seq((1L, "audio", payload)).toDF("doc_id", "kind", "payload")
    val rows = graft.operators.MultimodalOp.acfLagHistogram(media).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("kind") === "audio")
    assert(rows.head.getAs[Long]("best_lag") === 4L)
    assert(rows.head.getAs[Long]("n_docs") === 1L)
  }

  test("qualityDupReliability: dup rate per uniq-ratio decile") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a"), (3L, "e f g h"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("da", "db")
    val rows = graft.operators.DedupOp
      .qualityDupReliabilityFromPairs(docs, pairs).collect()
      .map(r => r.getAs[Long]("uniq_decile") -> r).toMap
    // uniq 1.0 → decile capped at 9 (docs 1, 3; only 1 is a dup)
    assert(rows(9L).getAs[Long]("n_docs") === 2L)
    assert(rows(9L).getAs[Long]("n_dup_docs") === 1L)
    assert(rows(9L).getAs[Long]("dup_rate_ppm") === 500000L)
    // uniq 0.25 → decile 2, the dup template
    assert(rows(2L).getAs[Long]("n_dup_docs") === 1L)
    assert(rows(2L).getAs[Long]("dup_rate_ppm") === 1000000L)
  }

  test("lshBandPlanner: detect bounded and monotone in s, b; anti in r") {
    val byArm = (50 to 100 by 10).map { p =>
      val one = Seq((1L, 2L, p / 100.0)).toDF("da", "db", "jaccard")
      p -> DedupOp.lshBandPlanner(one).collect()
        .map(r => (r.getAs[Long]("r"), r.getAs[Long]("b"))
          -> r.getAs[Long]("mean_detect_ppm")).toMap
    }
    val arms = byArm.head._2.keys
    for (arm <- arms) {
      val series = byArm.map(_._2(arm))
      assert(series.forall(v => v >= 0L && v <= 1000000L), s"bounds $arm")
      assert(series.zip(series.tail).forall { case (a, b) => a <= b },
        s"monotone in s for $arm")
    }
    for ((_, m) <- byArm) {
      assert(m((4L, 16L)) >= m((4L, 8L))) // more bands detect more
      assert(m((4L, 8L)) >= m((8L, 8L))) // longer rows detect less
    }
  }

  test("dupTransitivity: complete graph K5 scores exactly 1e6 ppm") {
    val k5 = (for (a <- 1 to 5; b <- (a + 1) to 5) yield (a.toLong, b.toLong))
      .toDF("da", "db")
    val r = DedupOp.dupTransitivity(k5).collect().head
    assert(r.getAs[Long]("n_wedges") === 30L)
    assert(r.getAs[Long]("n_triangles") === 10L)
    assert(r.getAs[Long]("transitivity_ppm") === 1000000L)
  }

  test("hits: complete bipartite graph is score-uniform per side") {
    // K_{2,3}: customers {2,4}, suppliers {3,5,7} — symmetry forces
    // every hub and every authority to the max, ppm 1e6 each.
    val edges = (for (c <- Seq(2L, 4L); s <- Seq(3L, 5L, 7L)) yield (c, s))
      .toDF("src", "dst")
    val rows = GraphOps.hits(edges).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("score_ppm") === 1000000L))
  }

  test("runsTest: median ties drop, runs and expectation hand-computed") {
    // cents 100,900,200,900,200 (ts order 0..4): median 200 (rank-3 of
    // the histogram), 200s drop → signs over 100,900,900 = neg,pos,pos
    // → 2 runs; expected = 1 + 2·2·1/3 → 2_333_333 ppm.
    val df = Seq(
      (1L, 10L, ts(0), "x", 1.00), (1L, 11L, ts(1), "x", 9.00),
      (1L, 12L, ts(2), "x", 2.00), (1L, 13L, ts(3), "x", 9.00),
      (1L, 14L, ts(4), "x", 2.00)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = graft.operators.StatTestOps.runsTest(df).collect().head
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Long]("n_runs") === 2L)
    assert(r.getAs[Long]("expected_runs_ppm") === 2333333L)
  }

  test("shingleDfHist: df octaves, pair mass, and the blocking cap") {
    // three copies of one shingle (df=3 → octave 1, pair mass 3) and
    // one singleton (df=1 → octave 0).
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "x y z")).toDF("doc_id", "text")
    val rows = DedupOp.shingleDfHist(docs, maxDf = 2).collect()
      .map(r => r.getAs[Long]("octave") -> r).toMap
    assert(rows(0L).getAs[Long]("n_shingles") === 1L)
    assert(rows(0L).getAs[Long]("pair_mass") === 0L)
    assert(rows(1L).getAs[Long]("n_shingles") === 1L)
    assert(rows(1L).getAs[Long]("sum_df") === 3L)
    assert(rows(1L).getAs[Long]("pair_mass") === 3L)
    assert(rows(1L).getAs[Long]("n_blocked") === 1L) // df 3 > cap 2
  }

  test("minhashPermHealth: 16 permutations, means bounded in ppm") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val rows = DedupOp.minhashPermHealth(docs).collect()
    assert(rows.length === 16)
    assert(rows.forall { r =>
      val m = r.getAs[Long]("mean_ppm")
      m >= 0L && m <= 1000000L && r.getAs[Long]("n_docs") == 2L
    })
  }

  test("qualityMassCurve: best decile first, cumulative share to 1e6") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a")).toDF("doc_id", "text")
    val rows = TextOps.qualityMassCurve(docs).collect()
    assert(rows.map(_.getAs[Long]("uniq_decile")).toSeq === Seq(9L, 2L))
    assert(rows(0).getAs[Long]("cum_share_ppm") === 500000L)
    assert(rows(1).getAs[Long]("cum_share_ppm") === 1000000L)
  }

  test("supplierHhi: two suppliers 1:3 gives 625000 ppm") {
    val li = Seq((1L, 100.00), (2L, 300.00))
      .toDF("l_suppkey", "l_extendedprice")
    val sup = Seq((1L, 0L), (2L, 0L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((0L, "GERMANY")).toDF("n_nationkey", "n_name")
    val r = graft.operators.RelationalOps.supplierHhi(li, sup, nat)
      .collect().head
    assert(r.getAs[String]("nation") === "GERMANY")
    assert(r.getAs[Long]("n_suppliers") === 2L)
    assert(r.getAs[Long]("total_cents") === 40000L)
    assert(r.getAs[Long]("hhi_ppm") === 625000L) // (1²+3²)/4² = 0.625
  }

  test("corpusManifest: 10 tables, unique keys unique, no null keys") {
    val rows = graft.operators.AuditOps
      .corpusManifest(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 10)
    val m = rows.map(r => r.getAs[String]("tbl") -> r).toMap
    assert(rows.forall(_.getAs[Long]("n_null_keys") === 0L))
    assert(m("customer").getAs[Long]("n_distinct_keys")
      === m("customer").getAs[Long]("n_rows"))
    // lineitem's key is the ORDER key by design — non-unique
    assert(m("lineitem").getAs[Long]("n_distinct_keys")
      < m("lineitem").getAs[Long]("n_rows"))
  }

  test("bytesPerToken: pooled byte and token masses per language") {
    // "ab cd": 5 bytes, 2 ws, 2 re; "x!y": 3 bytes, 1 ws, 2 re.
    val docs = Seq(("en", "ab cd"), ("en", "x!y"), ("de", "foo"))
      .toDF("lang", "text")
    val rows = TextOps.bytesPerToken(docs).collect()
    assert(rows.length === 2)
    val en = rows.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("n_bytes") === 8L)
    assert(en.getAs[Long]("n_ws_tokens") === 3L)
    assert(en.getAs[Long]("n_re_tokens") === 4L)
    assert(en.getAs[Long]("bytes_per_ws_ppm") === 2666667L)
    assert(en.getAs[Long]("bytes_per_re_ppm") === 2000000L)
    val de = rows.find(_.getAs[String]("lang") == "de").get
    assert(de.getAs[Long]("bytes_per_ws_ppm") === 3000000L)
  }
}
