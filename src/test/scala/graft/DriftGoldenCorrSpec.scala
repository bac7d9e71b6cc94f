package graft

import graft.operators.{AuditOps, DedupOp, SimilarityOp}

/** Crafted-fixture semantics for the q209–q212 tier: robust
  * median/MAD scaling, column-level snapshot drift (null-safe),
  * golden-record canonicalization, and dimension-pair correlation.
  */
class DriftGoldenCorrSpec extends SparkSuite {
  import spark.implicits._

  test("robustScaleAudit: exact median/MAD and 3-MAD outlier count") {
    val emb = Seq(1.0f, 2.0f, 3.0f, 4.0f, 100.0f).zipWithIndex.map {
      case (v, i) => (i.toLong, Array(v), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = SimilarityOp.robustScaleAudit(emb).collect().head
    assert(r.getLong(1) === 5L)      // n
    assert(r.getDouble(2) === 3.0)   // med (rank ⌈5/2⌉ = 3)
    // devs sorted: 0,1,1,2,97 → mad at rank 3 = 1
    assert(r.getDouble(3) === 1.0)
    assert(r.getLong(4) === 1L)      // only |100−3|=97 > 3·1
  }

  test("columnDrift attributes changes per column, null-safe") {
    val v1 = Seq(
      (0L, "alpha text", "en", "s0", 10L),
      (1L, "beta text", "en", "s1", 9L),
      (2L, "gamma text", null.asInstanceOf[String], "s2", 10L),
      (3L, "delta text", "en", "s3", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v2 = Seq(
      (0L, "alpha text CHANGED", "en", "s0", 10L), // text only
      (1L, "beta text", "en", "s1", 99L),          // n_chars only
      (2L, "gamma text", null.asInstanceOf[String], "s2", 10L), // null==null
      (4L, "added", "en", "s4", 5L)                // not common
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.columnDrift(v1, v2,
        Seq("lang", "n_chars", "source", "text")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "lang" -> ((3L, 0L)), "n_chars" -> ((3L, 1L)),
      "source" -> ((3L, 0L)), "text" -> ((3L, 1L))))
  }

  test("columnDrift flags null-to-value transitions as changes") {
    val v1 = Seq((0L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val v2 = Seq((0L, "t", null.asInstanceOf[String], "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = AuditOps.columnDrift(v1, v2, Seq("lang")).collect().head
    assert(out.getLong(2) === 1L)
  }

  test("goldenRecord clusters token-set-equal names under the min id") {
    val parts = Seq(
      (10L, "small ring", "Brand#1"),
      (7L, "ring small", "Brand#2"),   // permuted — same entity
      (8L, "ring ring small", "Brand#1"), // repeats collapse
      (9L, "blue bolt", "Brand#1")     // singleton — excluded
    ).toDF("p_partkey", "p_name", "p_brand")
    val out = DedupOp.goldenRecord(parts).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "ring small")
    assert(r.getLong(1) === 7L)  // golden = min id
    assert(r.getLong(2) === 3L)  // members
    assert(r.getLong(3) === 2L)  // brands spanned
  }

  test("dimCorrTopK ranks perfect correlation by |corr| with dim ties") {
    // dim1 = dim0 (corr 1e6), dim2 = −dim0 (corr −1e6), dim3 noise-free
    // constant (zero variance → NULL, filtered)
    val emb = Seq(1.0f, 2.0f, 3.0f, 5.0f).zipWithIndex.map { case (v, i) =>
      (i.toLong, Array(v, v, -v, 7.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = SimilarityOp.dimCorrTopK(emb, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 1L, 1000000L), (0L, 2L, -1000000L),
      (1L, 2L, -1000000L)))
  }

  test("markovStationary: hand-computed asymmetric 2-state chain") {
    import java.sql.Timestamp
    import graft.operators.EventOps
    // one user, sequence a,a,b,a → trans a→a, a→b, b→a; out(a)=2, out(b)=1
    val seq = Seq("a", "a", "b", "a")
    val evs = seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, new Timestamp(1704067200000L + i * 1000L), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.markovStationary(evs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // v0=(5e8,5e8); v1=(7.5e8,2.5e8); v2=(6.25e8,3.75e8); v3=(6.875e8,…)
    assert(out === Map("a" -> 687500000L, "b" -> 312500000L))
  }

  test("markovStationary: no same-user consecutive pairs returns an " +
       "empty frame, not a division failure") {
    import java.sql.Timestamp
    import graft.operators.EventOps
    // every user has exactly one event → lag() is NULL everywhere →
    // the chain has no states (nTypes = 0)
    val evs = Seq(
      (1L, new Timestamp(1704067200000L), 1L, "a", 1.0, "{}"),
      (2L, new Timestamp(1704067201000L), 2L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.markovStationary(evs)
    assert(out.columns.toSeq === Seq("event_type", "stat_ppb"))
    assert(out.count() === 0L)
  }

  test("labelAnova: hand-computed F on separated 1-dim groups") {
    import graft.operators.SimilarityOp
    val emb = Seq(
      (1L, Array(1.00f), 0), (2L, Array(1.02f), 0),
      (3L, Array(3.00f), 1), (4L, Array(3.02f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = SimilarityOp.labelAnova(emb).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)))
    assert(r.getLong(2) === 40000L) // ssb
    assert(r.getLong(3) === 4L)     // ssw
    assert(r.getLong(4) === 20000000000L) // F = 20000 → 2e10 ppm
  }

  test("splitBalanceAudit: splits partition every source; χ² ≥ 0") {
    import graft.operators.ScaleOps
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = ScaleOps.splitBalanceAudit(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4))
      assert(r.getLong(5) >= 0L)
    }
  }

  test("piiScrub redacts every occurrence and flags exactly") {
    import graft.operators.TextOps
    val docs = Seq(
      (0L, "mail me at a.b@x.io or c@y.net ok", "en", "s", 33L),
      (1L, "digits 12-34 but no pii here", "en", "s", 28L),
      (2L, "ring 555-000-1234 twice 555-000-1234", "en", "s", 36L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0L -> ((1L, 0L)), 1L -> ((0L, 0L)), 2L -> ((0L, 1L))))
    // both emails / both phone occurrences are gone from the receipts:
    // scrub again — a second pass must be a no-op (same md5)
    val once = TextOps.piiScrub(docs).collect().map(_.getString(3)).toSeq
    val planted = TextOps.plantPii(docs)
    val o1 = TextOps.piiScrub(planted).collect().map(_.getString(3)).toSeq
    assert(once.length === 3 && o1.length === 3)
    assert(o1(0) !== once(0)) // doc 0 (id%7==0) gained planted PII
  }
}
