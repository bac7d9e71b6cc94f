package graft

import graft.operators.{AuditOps, FeatureOps, MultimodalOp, ScaleOps, SimilarityOp, StatTestOps, TextOps}
import org.apache.spark.sql.functions._

/** Semantics of the round-10 statistics/feature block: rank tests on
  * crafted samples with hand-computed statistics, Gini gain on perfect
  * vs useless splits, the changepoint locator on a known level shift,
  * floor (not truncate) bucketing of negative balances in the
  * k-anonymity QI, and the ZCR fold on monotone vs zigzag payloads.
  */
class StatTestSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("mannWhitney: separated samples give |delta| = 1, ties counted") {
    // arm 0 = even user ids. Values: A = {1, 2}, B = {2, 3} (cents).
    // Doubled avg ranks: 1→2, 2→5 (avg 2.5), 3→8.
    // 2R_a = 2+5 = 7 → u2_a = 7 − 2·3 = 1; u2_b = 13 − 6 = 7;
    // identity u2_a + u2_b = 2·n_a·n_b = 8 holds; tie_term = 2³−2 = 6.
    val df = Seq(
      (0L, "x", 0.01), (2L, "x", 0.02),
      (1L, "x", 0.02), (3L, "x", 0.03)
    ).toDF("user_id", "event_type", "value")
    val r = StatTestOps.mannWhitney(df).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") === 2L)
    assert(row.getAs[Long]("n_b") === 2L)
    assert(row.getAs[Long]("u2_a") === 1L)
    assert(row.getAs[Long]("u2_b") === 7L)
    assert(row.getAs[Long]("tie_term") === 6L)
    // delta = (1 − 7)/(2·4) = −0.75
    assert(row.getAs[Long]("delta_ppm") === -750000L)

    // fully separated: A = {1,2,3}, B = {4,5,6} → delta = −1
    val sep = Seq(
      (0L, "x", 0.01), (2L, "x", 0.02), (4L, "x", 0.03),
      (1L, "x", 0.04), (3L, "x", 0.05), (5L, "x", 0.06)
    ).toDF("user_id", "event_type", "value")
    val s = StatTestOps.mannWhitney(sep).collect().head
    assert(s.getAs[Long]("u2_a") === 0L)
    assert(s.getAs[Long]("u2_b") === 18L)
    assert(s.getAs[Long]("delta_ppm") === -1000000L)
    assert(s.getAs[Long]("tie_term") === 0L)
  }

  test("wilcoxonSigned: zero diffs drop, signed ranks split correctly") {
    // Range [0s, 100s] → mid at 50s. Purchases per user:
    //  u1: 1.00 then 3.00  → d = +200
    //  u2: 3.00 then 2.00  → d = −100
    //  u3: 2.00 then 2.00  → d = 0 (drops)
    //  u4: 1.00 then 2.00  → d = +100
    // |d| ranks: 100 → avg(1,2) = 1.5 (2r̄ = 3) twice, 200 → 2r̄ = 6.
    // W2+ = 3 + 6 = 9, W2− = 3; tie_term = 2³ − 2 = 6.
    val df = Seq(
      (1L, ts(0), "purchase", 1.00), (1L, ts(100), "purchase", 3.00),
      (2L, ts(10), "purchase", 3.00), (2L, ts(90), "purchase", 2.00),
      (3L, ts(20), "purchase", 2.00), (3L, ts(80), "purchase", 2.00),
      (4L, ts(30), "purchase", 1.00), (4L, ts(70), "purchase", 2.00),
      (9L, ts(40), "view", 99.0) // non-purchase noise must be ignored
    ).toDF("user_id", "ts", "event_type", "value")
    val r = StatTestOps.wilcoxonSigned(df).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_pairs") === 3L)
    assert(row.getAs[Long]("n_zero") === 1L)
    assert(row.getAs[Long]("w2_plus") === 9L)
    assert(row.getAs[Long]("w2_minus") === 3L)
    assert(row.getAs[Long]("tie_term") === 6L)
    // rank-biserial = (9−3)/12 = 0.5
    assert(row.getAs[Long]("rank_biserial_ppm") === 500000L)
  }

  test("changepoint: locates a clean level shift at the boundary hour") {
    // hours 0..4 at 1.00/h, hours 5..9 at 9.00/h → split after hr 4.
    val rows = (0 until 10).map { h =>
      (1L, ts(h * 3600L), "purchase", if (h < 5) 1.00 else 9.00)
    }
    val r = StatTestOps.changepoint(
      rows.toDF("user_id", "ts", "event_type", "value")).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("split_hr") === 4L)
    assert(row.getAs[Long]("n_left") === 5L)
    assert(row.getAs[Long]("n_right") === 5L)
    assert(row.getAs[Long]("sum_left_c") === 500L)
    assert(row.getAs[Long]("sum_right_c") === 4500L)
    assert(row.getAs[Double]("mean_left_c") === 100.0)
    assert(row.getAs[Double]("mean_right_c") === 900.0)
    // g = |500·10 − 5·5000| = 20000
    assert(row.getAs[String]("g_stat") === "20000")
  }

  test("giniGain: perfect split gains the full parent impurity, useless gains 0") {
    val orders = Seq(
      // priority perfectly separates F from O; every order shares one
      // segment/nation (useless features).
      (1L, 10L, "F", "1-URGENT"), (2L, 10L, "F", "1-URGENT"),
      (3L, 20L, "O", "2-HIGH"), (4L, 20L, "O", "2-HIGH")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val customer = Seq((10L, 0, "AUTO"), (20L, 0, "AUTO"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val nation = Seq((0, "FRANCE")).toDF("n_nationkey", "n_name")
    val out = FeatureOps.giniGain(orders, customer, nation).collect()
      .map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("parent_ppm"), r.getAs[Long]("child_ppm"),
          r.getAs[Long]("gain_ppm"))).toMap
    // parent: p = 1/2 → 2p(1−p) = 0.5
    assert(out("o_orderpriority") === ((500000L, 0L, 500000L)))
    assert(out("c_mktsegment") === ((500000L, 500000L, 0L)))
    assert(out("n_name") === ((500000L, 500000L, 0L)))
  }

  test("targetEncoding: encoding shrinks toward the train prior by m") {
    val enc = FeatureOps.targetEncoding(
      graft.tables.Tables.orders(spark, "/root/testdata/sf0.001"),
      graft.tables.Tables.customer(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(enc.nonEmpty)
    val prior = enc.head.getAs[Long]("prior_ppm")
    enc.foreach { r =>
      val raw = r.getAs[Long]("pos_train") * 1000000L
      val nTr = r.getAs[Long]("n_train")
      val e = r.getAs[Long]("enc_ppm")
      // enc must lie within [min, max] of (raw rate, prior) — the
      // defining property of m-estimate shrinkage.
      val rawRate = if (nTr > 0) raw / nTr else prior
      assert(e >= math.min(rawRate, prior) - 1 &&
        e <= math.max(rawRate, prior) + 1,
        s"enc $e outside [$rawRate, $prior]")
    }
  }

  test("kAnonymity: negative balances floor to bucket −1, not truncate to 0") {
    val cust = Seq(
      (1L, 1, "AUTO", -0.01),  // cents −1 → kilobucket −1
      (2L, 1, "AUTO", 0.00),   // bucket 0
      (3L, 1, "AUTO", 999.99), // cents 99999 → bucket 0
      (4L, 1, "AUTO", 1000.00) // bucket 1
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val hist = AuditOps.kAnonymity(cust, kThresh = 5L).collect()
    // classes: bucket −1 (1 row), bucket 0 (2 rows), bucket 1 (1 row)
    val m = hist.map(r => r.getAs[Long]("class_size") ->
      (r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"))).toMap
    assert(m(1L) === ((2L, 2L)))
    assert(m(2L) === ((1L, 2L)))
    assert(hist.forall(_.getAs[Long]("under_k") === 1L))
  }

  test("zipfCurve: ranks, shares and the n·rank product are exact") {
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a b")
    ).toDF("doc_id", "text")
    val r = TextOps.zipfCurve(docs, k = 3).collect()
    // counts: a=4, b=3, c=1; total 8
    assert(r.map(_.getAs[String]("token")).toSeq === Seq("a", "b", "c"))
    assert(r.map(_.getAs[Long]("n")).toSeq === Seq(4L, 3L, 1L))
    assert(r.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("share_ppm")).toSeq ===
      Seq(500000L, 375000L, 125000L))
    assert(r.map(_.getAs[Long]("cum_share_ppm")).toSeq ===
      Seq(500000L, 875000L, 1000000L))
    assert(r.map(_.getAs[Long]("zipf_c")).toSeq === Seq(4L, 6L, 3L))
  }

  test("hubness: a dominant hub shows up in every other top-k list") {
    // 4 vectors (qmod=1 keeps them all): v0 near-parallel to each of
    // v3, v6, v9; those three are mutually near-orthogonal, so with
    // k=1 every one of them picks v0 — in-degree 3 for the hub.
    val e = Seq(
      (0L, Array(1f, 1f, 1f)),
      (3L, Array(1f, 0f, 0f)),
      (6L, Array(0f, 1f, 0f)),
      (9L, Array(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val hist = SimilarityOp.hubness(e, qmod = 3, k = 1).collect()
      .map(r => r.getAs[Long]("in_degree") -> r.getAs[Long]("n_vecs")).toMap
    // v0's own top-1 is one of the axis vectors (in-degree 1 for it);
    // the other two axis vectors get 0; v0 gets 3.
    assert(hist(3L) === 1L)
    assert(hist(0L) === 2L)
    assert(hist(1L) === 1L)
  }

  test("diffInDiff: arm B's extra lift nets out arm A's trend") {
    // arm 0 (even users): 1.00 → 2.00; arm 1: 1.00 → 4.00.
    // DiD = (400 − 100) − (200 − 100) cents = 2.00 → 20000 c100.
    val df = Seq(
      (0L, ts(0), "purchase", 1.00), (0L, ts(100), "purchase", 2.00),
      (1L, ts(0), "purchase", 1.00), (1L, ts(100), "purchase", 4.00)
    ).toDF("user_id", "ts", "event_type", "value")
    val r = StatTestOps.diffInDiff(df).collect().head
    assert(r.getAs[Long]("mean_a_pre_c100") === 10000L)
    assert(r.getAs[Long]("mean_a_post_c100") === 20000L)
    assert(r.getAs[Long]("mean_b_pre_c100") === 10000L)
    assert(r.getAs[Long]("mean_b_post_c100") === 40000L)
    assert(r.getAs[Long]("did_c100") === 20000L)
  }

  test("goodTuring: count-of-counts estimators are exact") {
    // en: a a b c → N=4, V=3, n1=2, n2=1; p0 = 1/2; r*1 = 2·1/2 = 1.0;
    // D = 2/(2+2) = 1/2.
    val docs = Seq((1L, "a a b c", "en")).toDF("doc_id", "text", "lang")
    val r = TextOps.goodTuring(docs).collect().head
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n1") === 2L)
    assert(r.getAs[Long]("n2") === 1L)
    assert(r.getAs[Long]("p0_ppm") === 500000L)
    assert(r.getAs[Long]("rstar1_e4") === 10000L)
    assert(r.getAs[Long]("kn_discount_ppm") === 500000L)
  }

  test("pairAuditSample: buckets are integer deciles, draw capped at m") {
    val pairs = Seq(
      (1L, 2L, 0.5), (3L, 4L, 0.5234), (5L, 6L, 0.5999),
      (7L, 8L, 0.9999), (9L, 10L, 1.0)
    ).toDF("da", "db", "jaccard")
    val out = graft.operators.DedupOp.pairAuditSample(pairs, m = 2).collect()
    val byBucket = out.groupBy(_.getAs[Long]("bucket"))
      .view.mapValues(_.length).toMap
    // 0.5/0.5234/0.5999 → bucket 5 (capped at 2 drawn); 0.9999 → 9; 1.0 → 10
    assert(byBucket === Map(5L -> 2, 9L -> 1, 10L -> 1))
    assert(out.forall(_.getAs[Long]("rk") <= 2L))
  }

  test("qualityBudget: best docs fill the budget first") {
    val docs = Seq(
      (1L, "s1", ("a b c d e f g h i j")),          // 10 uniq/10 → q=1e6
      (2L, "s1", Seq.fill(10)("x").mkString(" "))   // 1 uniq/10 → q=1e5
    ).map { case (id, s, t) => (id, t, s) }.toDF("doc_id", "text", "source")
    val r = ScaleOps.qualityBudget(docs, budget = 15L).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Long]("kept_tokens") === 10L)
    // 10/15 of the budget used → 666667 ppm
    assert(r.getAs[Long]("util_ppm") === 666667L)
  }

  test("featureHashing: buckets=1 collapses the whole vocabulary") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val r = TextOps.featureHashing(docs, buckets = 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_types") === 3L)
    assert(r.head.getAs[Long]("n_buckets") === 1L)
    assert(r.head.getAs[Long]("token_mass") === 4L)
  }

  test("covariateShiftWeights: train-share-weighted weights recover val mass") {
    val w = ScaleOps.covariateShiftWeights(
      graft.tables.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(w.nonEmpty)
    val nt = w.map(_.getAs[Long]("n_train")).sum
    val nv = w.map(_.getAs[Long]("n_val")).sum
    assert(nt > 0 && nv > 0)
    // sum over bins of w(b)·n_train_b/N_train = covered val share — must
    // equal 1 up to per-bin rounding when every val bin has train support.
    val covered = w.filter(r => !r.isNullAt(r.fieldIndex("weight_ppm")))
    val lhs = covered.map(r =>
      r.getAs[Long]("weight_ppm").toDouble * r.getAs[Long]("n_train")).sum /
      nt.toDouble
    val valShare = covered.map(_.getAs[Long]("n_val")).sum * 1e6 / nv.toDouble
    assert(math.abs(lhs - valShare) < w.length + 1.0,
      s"identity violated: $lhs vs $valShare")
  }

  test("seasonalMase: a perfectly daily series has zero seasonal error") {
    // 48 hourly purchases repeating a 24-hour pattern → lag-24 MAE 0,
    // lag-1 MAE > 0 → mase_ppm = 0.
    val rows = (0 until 48).map { h =>
      (1L, ts(h * 3600L), "purchase", 1.00 + (h % 24) * 0.50)
    }
    val r = StatTestOps.seasonalMase(
      rows.toDF("user_id", "ts", "event_type", "value")).collect().head
    assert(r.getAs[Long]("n_hours") === 48L)
    assert(r.getAs[Long]("n1") === 47L)
    assert(r.getAs[Long]("n24") === 24L)
    assert(r.getAs[Double]("mae24_c") === 0.0)
    assert(r.getAs[Long]("mase_ppm") === 0L)
    // lag-1 MAE: 46 steps of +50c and 1 wrap of −1150c → (46·50+1150)/47
    assert(r.getAs[Double]("mae1_c") === 73.40)
  }

  test("holdoutBigramCoverage: coverage ratios are well-formed on real data") {
    val r = TextOps.holdoutBigramCoverage(
      graft.tables.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val vt = row.getAs[Long]("n_val_types")
      val st = row.getAs[Long]("n_seen_types")
      assert(st >= 0L && st <= vt)
      assert(row.getAs[Long]("seen_mass") <= row.getAs[Long]("val_mass"))
      assert(row.getAs[Long]("type_cov_ppm") <= 1000000L)
      assert(row.getAs[Long]("mass_cov_ppm") <= 1000000L)
      // mass coverage dominates type coverage when frequent bigrams are
      // the covered ones — not asserted (data-dependent), but both > 0
      // at sf0.001 where train is 90% of a shared-vocab corpus.
      assert(row.getAs[Long]("mass_cov_ppm") > 0L)
    }
  }

  test("datasetCard: card metrics are exact on a tiny corpus") {
    val docs = Seq(
      (1L, "a b b", "en", "s1", 5L),
      (2L, "a b b", "en", "s2", 5L),  // exact dup of doc 1
      (3L, "c d", "fr", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = AuditOps.datasetCard(docs).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    assert(card("n_docs") === 3L)
    assert(card("n_langs") === 2L)
    assert(card("n_sources") === 2L)
    assert(card("n_tokens") === 8L)
    assert(card("vocab") === 4L)      // a b c d
    // singletons: c, d → 2/4
    assert(card("singleton_vocab_ppm") === 500000L)
    assert(card("n_exact_dup_docs") === 1L)
    // n_chars sorted: 3, 5, 5 → p50 = 2nd = 5; p90 = ceil(2.7) = 3rd = 5
    assert(card("p50_chars") === 5L)
    assert(card("p90_chars") === 5L)
  }

  test("localClustering: triangle corners score 1.0, the open apex 1/3") {
    // triangle 1-2-3 plus pendant edge 3-4: nodes 1,2 have cc=1
    // (decile 10); node 3 has deg 3, one closed pair → cc=1/3
    // (decile 3); node 4 deg 1 is excluded.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val hist = graft.operators.GraphOps.localClustering(edges).collect()
      .map(r => r.getAs[Long]("cc_decile") -> r.getAs[Long]("n_nodes")).toMap
    assert(hist === Map(3L -> 1L, 10L -> 2L))
  }

  test("zcrSegments: monotone bytes flip zero times, zigzag flips every step") {
    val mono = (0 until 64).map(i => ('a' + (i % 26)).toChar)
      .mkString // repeating ascending runs: flips only at wraparounds
    val zig = (0 until 64).map(i => if (i % 2 == 0) 'a' else 'z').mkString
    val docs = Seq((3L, zig), (4L, mono)).toDF("doc_id", "text")
    val out = MultimodalOp.zcrSegments(MultimodalOp.asMedia(
        docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text")).cast("long"))))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("total_flips")).toMap
    // zigzag: every interior position is a direction change → 62 flips
    assert(out(3L) === 62L)
    // ascending runs of 26: direction changes only at the 'z'→'a' drops
    // (each wrap contributes 2 flips: down-then-up). 64 chars → wraps
    // at i=26 and i=52 → interior centers i=25,26 and i=51,52 → 4.
    assert(out(4L) === 4L)
  }

  test("haarEnergy: hand-computed 4-hour series and gap zeros") {
    import graft.operators.EventOps
    // hours 0..3 with counts [3,1,2,2]:
    //  L1: d = {3−1, 2−2} = {2, 0} → E=4, blocks=2
    //  L2: d = {(3+1)−(2+2)} = {0} → E=0, blocks=1
    //  L3: first 4 hours (8) − empty half (0) → E=64
    //  L4: same single block → E=64. Total = 132.
    def ev(hr: Long, n: Int) = (0 until n).map(_ =>
      ("x", new java.sql.Timestamp(hr * 3600000L)))
    val df = (ev(0, 3) ++ ev(1, 1) ++ ev(2, 2) ++ ev(3, 2))
      .toDF("event_type", "ts")
    val r = EventOps.haarEnergy(df).collect()
      .map(x => x.getAs[Long]("level") ->
        (x.getAs[Long]("n_blocks"), x.getAs[Long]("energy"),
         x.getAs[Long]("energy_ppm"))).toMap
    assert(r(1L) === ((2L, 4L, 30303L)))
    assert(r(2L) === ((1L, 0L, 0L)))
    assert(r(3L) === ((1L, 64L, 484848L)))
    assert(r(4L) === ((1L, 64L, 484848L)))
    // gap: hours 0 and 3 only → L1 blocks {+5}, {−2} → E = 29: the
    // missing hours contribute exactly the zeros a dense series would.
    val g = (ev(0, 5) ++ ev(3, 2)).toDF("event_type", "ts")
    val r1 = EventOps.haarEnergy(g).collect()
      .find(_.getAs[Long]("level") == 1L).get
    assert(r1.getAs[Long]("n_blocks") === 2L)
    assert(r1.getAs[Long]("energy") === 29L)
  }

  test("propTrend: saturated-tier design gives Z^2 = 4 exactly") {
    // tiers s=0: n=2,a=0 and s=4 (capped from act 4 and 5): n=2,a=2.
    // N=4, A=2, Σsn=8, Σs²n=32, Σsa=8 → T = 4·8 − 2·8 = 16,
    // V = 2·2·(4·32 − 64) = 256, Z² = 4·16²/256 = 4 → 4e6 ppm.
    def ts0(i: Int) = new java.sql.Timestamp(i * 1000L)
    val rows =
      Seq((1L, "signup", ts0(0)), (2L, "signup", ts0(1))) ++
        (0 until 4).map(i => (3L, "click", ts0(10 + i))) ++
        Seq((3L, "purchase", ts0(20))) ++
        (0 until 5).map(i => (4L, "view", ts0(30 + i))) ++
        Seq((4L, "purchase", ts0(40)))
    val df = rows.toDF("user_id", "event_type", "ts")
    val r = StatTestOps.propTrend(df).collect().head
    assert(r.getAs[Long]("n_units") === 4L)
    assert(r.getAs[Long]("n_resp") === 2L)
    assert(r.getAs[Long]("sum_sn") === 8L)
    assert(r.getAs[Long]("sum_s2n") === 32L)
    assert(r.getAs[Long]("sum_sa") === 8L)
    assert(r.getAs[Long]("trend_sign") === 1L)
    assert(r.getAs[Long]("z2_ppm") === 4000000L)
  }

  test("participationRatio: anisotropic PR=1, isotropic PR=dims") {
    // label 0: ±(1,0) — all variance in dim 0 → PR = 1.
    // label 1: ±(1,1) — equal variance both dims → PR = 2.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(-1.0f, 0.0f), 0),
      (3L, Array(1.0f, 1.0f), 1), (4L, Array(-1.0f, -1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = SimilarityOp.participationRatio(emb, dims = 2).collect()
      .map(x => x.getAs[Long]("label") ->
        (x.getAs[Long]("n_vecs"), x.getAs[Long]("pr_ppm"))).toMap
    assert(r(0L) === ((2L, 1000000L)))
    assert(r(1L) === ((2L, 2000000L)))
  }

  test("kCenterCoreset: farthest-first trajectory and coverage radius") {
    // ids 1..4 at (0,0), (1,0), (0,1), (10,10); qmod=1, k=3.
    // Seed = id1. Farthest = id4 (d² = 2e14). Then id2 and id3 tie at
    // 1e12 → min vec_id picks id2. Coverage radius = id3's 1e12.
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 0), (4L, Array(10.0f, 10.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = SimilarityOp.kCenterCoreset(emb, k = 3, qmod = 1, dims = 2)
      .collect().map(x => (x.getAs[Long]("rnk"), x.getAs[Long]("vec_id"),
        x.getAs[Long]("d2")))
    assert(r.toSeq === Seq(
      (0L, -1L, 1000000000000L),
      (1L, 1L, 0L),
      (2L, 4L, 200000000000000L),
      (3L, 2L, 1000000000000L)))
  }

  test("detectorPrecisionAtK: hand-computed precision and ppm-term AP") {
    import graft.operators.DedupOp
    // ranked: (1,2) hit, (1,3) miss, (2,3) hit, (4,5) miss.
    // P@2 = 1/2; P@4 = 2/4. AP terms: r=1 → 1e6, r=3 → 666667;
    // AP = halfUp(1666667 / 2) = 833334.
    val mh = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (2L, 3L, 0.7),
      (4L, 5L, 0.6)).toDF("da", "db", "est_jaccard")
    val tp = Seq((1L, 2L), (2L, 3L)).toDF("da", "db")
    val r = DedupOp.detectorPrecisionAtK(mh, tp, ks = Seq(2, 4))
      .collect().map(x => x.getAs[Long]("k") ->
        (x.getAs[Long]("n_ranked"), x.getAs[Long]("n_true"),
         x.getAs[Long]("prec_ppm"))).toMap
    assert(r(2L) === ((2L, 1L, 500000L)))
    assert(r(4L) === ((4L, 2L, 500000L)))
    assert(r(0L) === ((2L, 2L, 833334L)))
  }

  test("degreeOctaves: star graph bins by log2 and decays 4:1") {
    import graft.operators.GraphOps
    // star center deg 4 → octave 2; leaves deg 1 → octave 0.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val r = GraphOps.degreeOctaves(edges).collect()
      .map(x => x.getAs[Long]("octave") ->
        (x.getAs[Long]("min_deg"), x.getAs[Long]("n_nodes"),
         x.getAs[Long]("sum_deg"),
         Option(x.get(x.fieldIndex("next_ratio_ppm"))))).toMap
    assert(r(0L) === ((1L, 4L, 4L, Some(250000L))))
    assert(r(2L) === ((4L, 1L, 4L, None)))
  }

  test("detectorMcnemar: counts reconcile with the two detectors") {
    import graft.operators.DedupOp
    // A corpus with an exact dup pair (both detectors fire) plus
    // unrelated docs. The op's cells must reconcile with the two
    // public detectors' pair sets, and χ² must follow (b−c)²/(b+c).
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine ten",
      4L -> "red orange yellow green blue indigo violet umber ochre",
      5L -> "alpha beta gamma delta epsilon zeta eta iota kappa lambda"
    )
    val docs = texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val mh = DedupOp.minhashLsh(docs).select("da", "db")
    val sh = DedupOp.simhashPairs(docs).select("da", "db")
    val both = mh.intersect(sh).count()
    val bOnly = mh.except(sh).count()
    val cOnly = sh.except(mh).count()
    val r = DedupOp.detectorMcnemar(docs).collect().head
    assert(r.getAs[Long]("n_pairs") === both + bOnly + cOnly)
    assert(r.getAs[Long]("n_both") === both)
    assert(r.getAs[Long]("n_minhash_only") === bOnly)
    assert(r.getAs[Long]("n_simhash_only") === cOnly)
    assert(r.getAs[Long]("disc_diff") === bOnly - cOnly)
    // the exact-dup pair is flagged by BOTH detectors
    assert(both >= 1L)
    if (bOnly + cOnly == 0L) assert(r.isNullAt(r.fieldIndex("mcnemar_x2_ppm")))
    else {
      val d = bOnly - cOnly
      assert(r.getAs[Long]("mcnemar_x2_ppm") ===
        (d * d * 2000000L + (bOnly + cOnly)) / (2L * (bOnly + cOnly)))
    }
  }
}
