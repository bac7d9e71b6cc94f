package graft

import graft.operators.{AuditOps, BucketedOps, MultimodalOp, SimilarityOp, TextOps}

/** Constructed-data tests for the round-9 session-3 additions: KS
  * drift (q236), sampled Kendall τ-b (q237), integer power-method PCA
  * (q238), silence segments (q239), zone-map skipping (q240), PRF
  * expansion (q241), and cross-modal dup agreement (q242). The
  * corpus-level hash gates prove engine parity; these pin the
  * semantics on cases with hand-computed exact answers.
  */
class KsTauPcaSpec extends SparkSuite {
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String, src: String) =
    (id, text, lang, src, text.length.toLong)

  test("ksByLang: exact sup of the CDF cross-multiplication") {
    // lang A lengths {1,1,2} (n1=3), lang B lengths {2,3} (n2=2).
    // D·n1·n2 = max(|2·2−0·3|, |3·2−1·3|, |3·2−2·3|) = 4 →
    // ks_ppm = round(4e6/6) = 666667, symmetric for the complement.
    val docs = Seq(
      doc(1, "a", "A", "s"), doc(2, "b", "A", "s"),
      doc(3, "cc", "A", "s"), doc(4, "dd", "B", "s"),
      doc(5, "eee", "B", "s")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.ksByLang(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("A", 3L, 2L, 666667L), ("B", 2L, 3L, 666667L)))
  }

  test("ksByLang: single-lang corpus has no complement -> NULL ks") {
    val docs = Seq(doc(1, "a", "A", "s"), doc(2, "bb", "A", "s"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = AuditOps.ksByLang(docs).collect()
    assert(r.length === 1 && r(0).isNullAt(3))
  }

  private def li(flag: String, ok: Long, ln: Long, qty: Long,
                 price: Double) =
    (flag, ok, ln, qty, price)

  test("kendallTau: perfect concordance, reversal, and tie correction") {
    // k (128) exceeds every group, so the sample is the whole group.
    // A: (1,10),(2,20),(3,30) → τ = +1. B reversed → −1.
    // C: (1,10),(1,20),(2,20) → nc=1, tox=1, toy=1 →
    //    τ = 1/√(2·2) = 0.5 → 500000.
    val rows = Seq(
      li("A", 1, 1, 1, 10.0), li("A", 2, 1, 2, 20.0), li("A", 3, 1, 3, 30.0),
      li("B", 4, 1, 1, 30.0), li("B", 5, 1, 2, 20.0), li("B", 6, 1, 3, 10.0),
      li("C", 7, 1, 1, 10.0), li("C", 8, 1, 1, 20.0), li("C", 9, 1, 2, 20.0)
    ).toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice")
    val out = AuditOps.kendallTau(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out === Seq(("A", 3L, 3L, 0L, 1000000L),
      ("B", 3L, 0L, 3L, -1000000L), ("C", 3L, 1L, 0L, 500000L)))
  }

  test("kendallTau: out-of-domain quantity trips the packing guard loudly") {
    // The sampler carries (x, y) packed as y*64 + x, exact only while
    // x < 64 — a quantity outside the domain must raise, not silently
    // corrupt the unpack (r14 guard; TPC-H quantity is 1..50).
    val rows = Seq(
      li("A", 1, 1, 1, 10.0), li("A", 2, 1, 99, 20.0)
    ).toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice")
    val e = intercept[Exception] {
      AuditOps.kendallTau(rows).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("packing domain")),
      s"expected the packing-domain raise_error, got: $e")
  }

  test("principalComponent: rank-1 cloud recovers its direction exactly") {
    // Vectors t·(1,2,0,0): direction (1,2,0,0), max-normalized →
    // v_ppm = (500000, 1000000, 0, 0); rank-1 scatter → the leading
    // eigenvalue IS the trace → ev_share_ppm = 1000000.
    val emb = Seq(
      (1L, Seq(1f, 2f, 0f, 0f), 0),
      (2L, Seq(2f, 4f, 0f, 0f), 0),
      (3L, Seq(3f, 6f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOp.principalComponent(emb, dims = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 500000L, 1000000L), (1L, 1000000L, 1000000L),
      (2L, 0L, 1000000L), (3L, 0L, 1000000L)))
  }

  test("principalComponent: empty input -> empty frame") {
    val emb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(SimilarityOp.principalComponent(emb, dims = 4).isEmpty)
  }

  test("silenceSegments: islands, longest run, and sub-window drop") {
    // win=4, hop=2, silMax=200; 'a'=97, ' '=32.
    // doc 1 "aaaa    aaaa": energies 388,258,128,258,388 → one silent
    // window → 1 segment, run 1, ppm 200000.
    // doc 2 8 spaces: 3 windows all 128 → 1 segment, run 3, ppm 1e6.
    // doc 3 "abc": shorter than one window → dropped.
    val media = Seq(
      (1L, "audio", "aaaa    aaaa".getBytes("UTF-8")),
      (2L, "audio", "        ".getBytes("UTF-8")),
      (3L, "video", "abc".getBytes("UTF-8"))
    ).toDF("doc_id", "kind", "payload")
    val out = MultimodalOp.silenceSegments(media, win = 4, hop = 2,
        silMax = 200L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(out === Seq((1L, 5L, 1L, 1L, 1L, 200000L),
      (2L, 3L, 3L, 1L, 3L, 1000000L)))
  }

  test("zoneMapSkipping: per-chunk min/max pruning, layout-invariant match count") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // rowsPerChunk=2: arrival chunks {0,1}, {2,3}, {4,5}.
    // chunk0 straddles the 1997-H1 predicate (scan, 0 matches),
    // chunk1 is entirely 1996 (skip), chunk2 inside (scan, 2 matches).
    val orders = Seq(
      (0L, ts("1996-01-01")), (1L, ts("1998-01-01")),
      (2L, ts("1996-05-01")), (3L, ts("1996-06-01")),
      (4L, ts("1997-02-01")), (5L, ts("1997-03-01"))
    ).toDF("o_orderkey", "o_orderdate")
    val arr = BucketedOps.zoneMapSkipping(orders, rowsPerChunk = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))) // (n_chunks, n_skipped, scanned, match)
      .toMap
    assert(arr("arrival") === ((3L, 1L, 4L, 2L)))
    // date-sorted: six distinct 30-day chunks, only the two 1997 ones
    // scanned — and the SAME match count (the layout-invariance check).
    assert(arr("datesorted") === ((6L, 4L, 2L, 2L)))
  }

  test("prfExpandedRetrieval: feedback terms widen the match set") {
    // Seed {q}, fb=2, expand=1. AND stage ranks d1 > d2 (tie with d4
    // broken by id). Expansion scores e=53332 > x=20000 inside
    // {d1,d2} → expand with "e"; OR stage then reaches d3, which has
    // no seed term at all.
    val docs = Seq(
      doc(1, "q q e e", "en", "s"), doc(2, "q e e x", "en", "s"),
      doc(3, "e e y y", "en", "s"), doc(4, "q x x x", "en", "s")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.prfExpandedRetrieval(docs, Seq("q"), fb = 2,
        expand = 1, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, 2L, 53332L), (2L, 2L, 39999L),
      (3L, 1L, 26666L), (4L, 1L, 13333L)))
  }

  test("vocabGrowth: first-seen attribution across value-range buckets") {
    // ids 0..9, buckets=2 → ids 0-4 in bucket 0, 5-9 in bucket 1.
    // Every doc "a b c d" ({abc, bcd}) except doc 7 "a b c x" adds
    // {bcx}. New types: bucket0 = 2, bucket1 = 1; slots 10 each.
    import graft.operators.DedupOp
    val docs = (0L until 10L).map(i =>
        doc(i, if (i == 7) "a b c x" else "a b c d", "en", "s"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOp.vocabGrowth(docs, buckets = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 10L, 2L, 2L), (1L, 10L, 1L, 3L)))
  }

  test("pcaDrift: aligned halves give cos2 = 1e6, orthogonal halves 0") {
    def half(ids: Seq[Long], dir: (Float, Float)) =
      ids.flatMap(id => Seq((id,
        Seq(dir._1 * (id / 2 + 1), dir._2 * (id / 2 + 1), 0f, 0f), 0)))
    val aligned = (half(Seq(0L, 2L, 4L), (1f, 2f)) ++
      half(Seq(1L, 3L, 5L), (1f, 2f)))
      .toDF("vec_id", "embedding", "label")
    val r1 = SimilarityOp.pcaDrift(aligned, dims = 4).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ===
      ((3L, 3L, 1000000L)))
    // (1,2) vs (2,−1): dot = 0 → cos² exactly 0.
    val ortho = (half(Seq(0L, 2L, 4L), (1f, 2f)) ++
      half(Seq(1L, 3L, 5L), (2f, -1f)))
      .toDF("vec_id", "embedding", "label")
    assert(SimilarityOp.pcaDrift(ortho, dims = 4).collect()(0)
      .getLong(2) === 0L)
  }

  test("kaplanMeier: censoring-correct repeat-purchase survival") {
    import graft.operators.EventOps
    def ts(h: Long) = new java.sql.Timestamp(h * 3600000L)
    // u1 purchases at h0,h2 (death t=2; last → censored t=5−2=3);
    // u2 purchases at h1 (censored t=5−1=4); corpus ends at the h5
    // view. Fold: t=2 has n=3,d=1 → S = round(1e9·2/3); censor steps
    // shrink the risk set but never move S.
    val ev = Seq(
      (1L, ts(0), 10L, "purchase", 1.0),
      (2L, ts(2), 10L, "purchase", 1.0),
      (3L, ts(1), 20L, "purchase", 1.0),
      (4L, ts(5), 30L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.kaplanMeier(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out === Seq((2L, 3L, 1L, 0L, 666666667L),
      (3L, 2L, 0L, 1L, 666666667L), (4L, 1L, 0L, 1L, 666666667L)))
  }

  test("logRank: hand-computed hypergeometric O-E terms") {
    import graft.operators.EventOps
    def ts(h: Long) = new java.sql.Timestamp(h * 3600000L)
    // Median split at vc=10 → hi = the 0.30 purchases (u1).
    // t=1: dt=1 (hi), n1=2, n2=2 → e=500000, v=250000.
    // t=2: dt=1 (lo), n1=1, n2=2 → e=333333, v=222222.
    // O1=1, E1=833333, diff=166667, V=472222 →
    // chi2_ppm = round(166667²/472222) = 58824, dir=+1.
    val ev = Seq(
      (1L, ts(0), 10L, "purchase", 0.30),
      (2L, ts(1), 10L, "purchase", 0.30),
      (3L, ts(0), 20L, "purchase", 0.10),
      (4L, ts(2), 20L, "purchase", 0.10),
      (5L, ts(4), 30L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventOps.logRank(ev).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((2L, 2L, 1L, 833333L, 472222L, 58824L, 1L)))
  }

  test("cupedLift: perfectly predictive pre-period zeroes the adjusted lift") {
    import graft.operators.EventOps
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // Days 0..3 → midpoint 2. Each user's post spend is exactly 2×
    // the pre spend, so θ = 2e6 ppm, ρ² = 1e6 ppm, and the CUPED-
    // adjusted lift is exactly 0 — independent of how the hash
    // assigns arms.
    val ev = Seq(
      (1L, ts(0), 10L, "purchase", 1.00), (2L, ts(2), 10L, "purchase", 2.00),
      (3L, ts(0), 20L, "purchase", 2.00), (4L, ts(2), 20L, "purchase", 4.00),
      (5L, ts(0), 30L, "purchase", 3.00), (6L, ts(2), 30L, "purchase", 6.00)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventOps.cupedLift(ev).collect()(0)
    assert(r.getLong(2) === 2000000L)       // theta_ppm
    assert(r.getLong(3) === 1000000L)       // var_reduction_ppm
    assert(r.getLong(5) === 0L)             // diff_cuped_micro
  }

  test("multiTouchAttribution: largest-remainder shares conserve every cent") {
    import graft.operators.TemporalOps
    def ts(h: Long) = new java.sql.Timestamp(h * 3600000L)
    // One 10-cent purchase, three touches → 10 = 4+3+3, the extra
    // cent to the most recent touch (signup).
    val ev = Seq(
      (2L, ts(1), 10L, "view", 0.0),
      (3L, ts(2), 10L, "click", 0.0),
      (4L, ts(3), 10L, "signup", 0.0),
      (5L, ts(4), 10L, "purchase", 0.10),
      (6L, ts(4), 20L, "purchase", 0.50) // no touches → direct
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.multiTouchAttribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(("(direct)", 1L, 50L), ("click", 1L, 3L),
      ("signup", 1L, 4L), ("view", 1L, 3L)))
    assert(out.map(_._3).sum === 60L) // conservation: 10 + 50 cents
  }

  test("chainingFromPairs: a path graph chains one unverified pair") {
    import graft.operators.DedupOp
    // 1-2, 2-3 (a path) + 4-5 (a clean pair): clusters {1,2,3} and
    // {4,5} imply 3+1 = 4 pairs vs 3 direct → excess 1, 250000 ppm.
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("da", "db")
    val r = DedupOp.chainingFromPairs(pairs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 2L, 3L, 4L, 1L, 250000L)))
  }

  test("crossModalDupAgreement: identical docs pair in both tiers") {
    // Two identical long docs (text pair via MinHash est=1.0, media
    // pair via all-windows alignment) + one unrelated doc.
    val t1 = (0 until 50).map(i => s"tok$i").mkString(" ")
    val t2 = (0 until 50).map(i => s"other$i").mkString(" ")
    val docs = Seq(doc(1, t1, "en", "s"), doc(2, t1, "en", "s"),
      doc(3, t2, "en", "s"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = MultimodalOp.crossModalDupAgreement(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((1L, 1L, 1L, 0L, 0L, 1000000L)))
  }
}
