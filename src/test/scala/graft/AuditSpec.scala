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
}
