package graft

import graft.operators.AuditOps
import graft.operators.AuditOps.FkRel

/** Planted-defect tests for the data-quality audit tier (q95/q96):
  * the real tables are healthy (zero orphans, zero NULLs — the oracle
  * proves that), so these verify the audits DETECT defects when they
  * exist.
  */
class AuditSpec extends SparkSuite {
  import spark.implicits._

  test("fkIntegrity counts planted orphans and NULL keys, healthy rel is zeros") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(
      Some(1L), Some(2L), Some(2L), // resolve
      Some(9L), Some(10L),          // orphans
      None                          // NULL key
    ).toDF("fk")
    val healthy = Seq(Some(3L), Some(1L)).toDF("fk")
    val out = AuditOps.fkIntegrity(Seq(
        FkRel("bad.fk->p.pk", child, "fk", parent, "pk"),
        FkRel("good.fk->p.pk", healthy, "fk", parent, "pk")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("bad.fk->p.pk") === ((6L, 1L, 2L)))
    assert(out("good.fk->p.pk") === ((2L, 0L, 0L)))
  }

  test("fkIntegrity audits INT child keys against BIGINT parents as one id space") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1, 2, 7).toDF("fk") // INT keys, one orphan
    val r = AuditOps.fkIntegrity(Seq(
      FkRel("c.fk->p.pk", child, "fk", parent, "pk"))).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 0L, 1L)))
  }

  test("snapshotDiff classifies added, removed, changed, unchanged per source") {
    val v1 = Seq(
      (1L, "srcA", "one"), (2L, "srcA", "two"),
      (3L, "srcB", "three"), (4L, "srcB", "four")
    ).toDF("doc_id", "source", "text")
    val v2 = Seq(
      (1L, "srcA", "one"),          // unchanged
      (2L, "srcA", "two EDITED"),   // changed
      (3L, "srcB", "three"),        // unchanged (4 removed)
      (9L, "srcB", "brand new")     // added
    ).toDF("doc_id", "source", "text")
    val out = AuditOps.snapshotDiff(v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("srcA", "changed") -> 1L, ("srcA", "unchanged") -> 1L,
      ("srcB", "added") -> 1L, ("srcB", "removed") -> 1L,
      ("srcB", "unchanged") -> 1L))
  }

  test("columnProfile reports rows, NULLs, and exact distincts per column") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)),
      (Some("b"), None), (None, Some(2L))
    ).toDF("s", "n")
    val out = AuditOps.columnProfile(df, Seq("s", "n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("s") === ((4L, 1L, 2L))) // a, b; one NULL
    assert(out("n") === ((4L, 1L, 2L))) // 1, 2; one NULL
  }

  test("featureCorr: perfect linear feature scores 1e6 ppm, constant is NULL") {
    // price = qty dollars exactly → corr(qty, dollars) = +1;
    // discount constant → zero variance → NULL by the guard.
    val li = (1 to 40).map { i =>
      val q = (i % 10) + 1
      ("N", "O", q.toDouble, q * 100.0, 0.05)
    }.toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount")
    val out = AuditOps.featureCorr(li).collect().head
    assert(out.getLong(2) === 40L)
    assert(out.getLong(3) === 1000000L)
    assert(out.isNullAt(4))
  }

  test("featureCorr: perfect inverse relation scores -1e6 ppm") {
    // discount falls exactly linearly as quantity rises
    val li = (1 to 30).map { i =>
      val q = (i % 6) + 1
      ("R", "F", q.toDouble, 1000.0, (10 - q) / 100.0)
    }.toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount")
    val out = AuditOps.featureCorr(li).collect().head
    assert(out.isNullAt(3)) // constant price → NULL
    assert(out.getLong(4) === -1000000L)
  }

  test("benfordChi2: planted Benford-exact counts score ~zero, uniform does not") {
    // 1000 rows whose leading-digit histogram matches the Benford
    // expectation to the nearest count: chi2 stays tiny. A uniform
    // digit histogram scores far higher.
    val bCounts = (1 to 9).map(d =>
      d -> math.rint(math.log10(1.0 + 1.0 / d) * 1000).toInt)
    val benford = bCounts.flatMap { case (d, n) =>
      Seq.fill(n)(d * 111.0) // leading digit d
    }.toDF("amt")
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d * 111.0)).toDF("amt")
    val bOut = AuditOps.benfordChi2(benford, "b", "amt").collect().head
    val uOut = AuditOps.benfordChi2(uniform, "u", "amt").collect().head
    assert(bOut.getLong(1) === bCounts.map(_._2).sum.toLong)
    assert(bOut.getLong(2) === 8L)
    // rounding each expected count to an integer costs < 0.5 per digit
    // → chi2 well under 0.1 (chi2_e6 < 100000)
    assert(bOut.getLong(3) < 100000L)
    assert(uOut.getLong(3) > 10000000L) // uniform: chi2 >> 10
  }

  test("contingencyChi2: independence scores zero, perfect association maxes V") {
    // perfectly independent 2x2 (every cell = 2): chi2 = 0, V = 0
    val indep = (Seq.fill(2)(("A", "X")) ++ Seq.fill(2)(("A", "Y")) ++
      Seq.fill(2)(("B", "X")) ++ Seq.fill(2)(("B", "Y"))).toDF("r", "c")
    val i = AuditOps.contingencyChi2(indep, "r", "c").collect().head
    assert((i.getLong(0), i.getLong(1), i.getLong(2), i.getLong(3)) ===
      (8L, 2L, 2L, 1L))
    assert(i.getLong(4) === 0L)   // chi2_milli
    assert(i.getLong(5) === 0L)   // cramers_v_e4
    // perfect association with STRUCTURAL ZERO cells (A only with X,
    // B only with Y): 2x2 with n=8 gives chi2 = n = 8, V = 1 — only
    // correct if the zero cells are materialized into the grid
    val assoc = (Seq.fill(4)(("A", "X")) ++ Seq.fill(4)(("B", "Y")))
      .toDF("r", "c")
    val a = AuditOps.contingencyChi2(assoc, "r", "c").collect().head
    assert(a.getLong(4) === 8000L)
    assert(a.getLong(5) === 10000L)
  }

  test("columnDrift: snapshots with no shared doc_ids emit zero counts, " +
       "null ratio — not a division failure") {
    val v1 = Seq((1L, "en", "a")).toDF("doc_id", "lang", "text")
    val v2 = Seq((2L, "en", "a")).toDF("doc_id", "lang", "text")
    val out = AuditOps.columnDrift(v1, v2, Seq("lang", "text")).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_common") === 0L)
      assert(r.getAs[Long]("n_changed") === 0L)
      assert(r.isNullAt(r.fieldIndex("changed_ppm")))
    }
  }

  test("embeddingCoverage counts per-source vector coverage, absent and duplicate vec rows handled") {
    val docs = Seq(
      (0L, "a"), (1L, "a"), (2L, "a"),
      (3L, "b"), (4L, "b")
    ).toDF("doc_id", "source")
    // vec 1 duplicated (must not double-count doc 1); vec 99 orphan
    // (no doc row — must not appear anywhere)
    val vecs = Seq(0L, 1L, 1L, 3L, 99L).toDF("vec_id")
    val out = AuditOps.embeddingCoverage(docs, vecs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((3L, 2L, 666667L)))
    assert(out("b") === ((2L, 1L, 500000L)))
  }

  test("reshardStability: rendezvous movement is exactly the keys won by the NEW shard (minimal disruption)") {
    import org.apache.spark.sql.functions._
    val k = 8
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val out = AuditOps.reshardStability(docs.toDF(), k).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent derivation of the rendezvous winners with the same
    // hash: a key moves iff candidate k outweighs every 0..k-1 weight —
    // the defining minimal-disruption property of HRW placement
    val moved = docs.select(col("doc_id"),
        explode(sequence(lit(0), lit(k))).as("s"))
      .select(col("doc_id"), col("s"),
        graft.functions.TextFunctions.portableHash(
          concat(col("s").cast("string"), lit("#"),
            reverse(col("doc_id").cast("string")))).as("h"))
      .groupBy("doc_id")
      .agg(min(struct((lit(0L) - col("h")).as("nh"), col("s").as("s")))
        .getField("s").as("win"))
      .where(col("win") === k).count()
    assert(out("rendezvous")._1 === 300L)
    assert(out("rendezvous")._2 === moved)
    // modulo: derived directly from the residues
    val modMoved = (0L until 300L).count(i => i % k != i % (k + 1)).toLong
    assert(out("mod") === ((300L, modMoved,
      Math.floorDiv(modMoved * 2000000L + 300L, 600L))))
  }
}
