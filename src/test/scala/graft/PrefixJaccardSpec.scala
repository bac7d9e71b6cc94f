package graft

import org.apache.spark.sql.DataFrame
import graft.operators.DedupOp

/** Losslessness proof for the q156 prefix-filter stack on CONSTRUCTED
  * inputs. The driver's oracle gate proves the filters complete on the
  * shipped corpus; these specs prove it on adversarial cases the corpus
  * may never contain — the exact J = 1/2 boundary, identical docs,
  * maximal shingle collision under a tiny vocabulary — against an
  * independent brute-force reference (plain Scala sets, all pairs, no
  * pruning, DetAgg's half-up 4-decimal rounding re-implemented on
  * exact integers).
  */
class PrefixJaccardSpec extends SparkSuite {
  import spark.implicits._

  private def docsDF(docs: Seq[(Long, String)]): DataFrame =
    docs.toDF("doc_id", "text")

  /** Brute force: distinct 3-shingle sets per doc, ALL pairs, exact
    * integer half-up ratio at 4 decimals, keep >= 1/2. */
  private def bruteForce(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val sh = docs.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    (for {
      Seq(a, b) <- docs.map(_._1).sorted.combinations(2)
      inter = (sh(a) & sh(b)).size
      union = sh(a).size + sh(b).size - inter
      if union > 0
      // half-up 4-decimal: round(1e4*I/U) >= 5000
      if (inter.toLong * 10000L * 2 + union) / (union.toLong * 2) >= 5000L
    } yield (a, b)).toSet
  }

  private def runOp(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    DedupOp.prefixJaccard(docsDF(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact J = 1/2 boundary pair survives the filter stack") {
    // A: w1..w8 (6 shingles), B: w3..w10 (6 shingles), shared = 4
    // J = 4 / (6+6-4) = 0.5 exactly — must be ADMITTED (>= threshold).
    val a = (1 to 8).map("w" + _).mkString(" ")
    val b = (3 to 10).map("w" + _).mkString(" ")
    // C shares only 3 shingles with A: J = 3/9 = 1/3 — must be dropped.
    val c = (4 to 11).map("w" + _).mkString(" ")
    val docs = Seq(1L -> a, 2L -> b, 3L -> c)
    val got = runOp(docs)
    assert(got.contains((1L, 2L)), "boundary J=0.5 pair must survive")
    assert(!got.contains((1L, 3L)), "J=1/3 pair must be dropped")
    assert(got == bruteForce(docs))
  }

  test("identical and near-identical docs are found") {
    val base = (1 to 20).map("t" + _).mkString(" ")
    val oneOff = ((1 to 19).map("t" + _) :+ "zzz").mkString(" ")
    val docs = Seq(1L -> base, 2L -> base, 3L -> oneOff,
      4L -> (21 to 40).map("t" + _).mkString(" "))
    assert(runOp(docs) == bruteForce(docs))
  }

  test("lossless under maximal collision: tiny vocab, many docs") {
    // 3-token vocabulary → only 27 possible shingles: every shingle is
    // shared by many docs and ranks INSIDE most prefixes — the
    // adversarial regime for prefix/positional filtering. Deterministic
    // LCG so the corpus is reproducible.
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % n).toInt + n) % n
    }
    val vocab = Seq("a", "b", "c")
    val docs = (1L to 30L).map { id =>
      val len = 5 + nextInt(15)
      id -> (1 to len).map(_ => vocab(nextInt(3))).mkString(" ")
    }
    val got = runOp(docs)
    val want = bruteForce(docs)
    assert(got == want,
      s"mismatch: extra=${got -- want}, missing=${want -- got}")
    assert(want.nonEmpty, "constructed corpus should produce pairs")
  }

  test("mixed sizes: length filter must not drop a qualifying skewed pair") {
    // na=6, nb=10, I=6 (A's shingles all inside B): J = 6/10 = 0.6 —
    // qualifying despite the size skew (2*min >= max holds: 12 >= 10).
    val a = (1 to 8).map("w" + _).mkString(" ")          // 6 shingles
    val b = (1 to 12).map("w" + _).mkString(" ")         // 10 shingles
    val docs = Seq(1L -> a, 2L -> b)
    val got = runOp(docs)
    assert(got.contains((1L, 2L)), "J=0.6 containment pair must survive")
    assert(got == bruteForce(docs))
  }

  test("write-once layout serves the identical pair set as recompute") {
    // The q156 serving path: prefixJaccardTable persists the verified
    // pairs and serves them back off parquet — the round-trip must be
    // value-identical to the direct recompute (schema, ids, 4-decimal
    // jaccard). Untagged call: the write-once guard is off, safe for
    // the arbitrary test frame.
    val base = (1 to 20).map("t" + _).mkString(" ")
    val docs = Seq(1L -> base, 2L -> base,
      3L -> ((1 to 19).map("t" + _) :+ "zzz").mkString(" "),
      4L -> (21 to 40).map("t" + _).mkString(" "))
    val wh = java.nio.file.Files.createTempDirectory("ppj-wh").toString
    val direct = DedupOp.prefixJaccard(docsDF(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val served = DedupOp.prefixJaccardTable(docsDF(docs), wh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(served == direct)
  }

  test("verification join is pinned: both branches execute and agree") {
    // The plan branches on measured payload vs broadcastBytes — never
    // on Catalyst's size estimate (the source of the observed plan
    // bimodality). Run the SAME corpus through both pins: bound = MAX
    // forces the broadcast branch, bound = 0 forces shuffle_hash with
    // the doc-array frame as build side (the corpus-scale plan, which
    // no test-scale corpus reaches via the measured default), and both
    // must produce the brute-force pair set.
    assert(DedupOp.VerifyBroadcastBytes == (64L << 20))
    val docs = Seq(1L -> (1 to 10).map("w" + _).mkString(" "),
      2L -> (3 to 12).map("w" + _).mkString(" "),
      3L -> (1 to 10).map("w" + _).mkString(" "),
      4L -> (20 to 30).map("w" + _).mkString(" "))
    val want = bruteForce(docs)
    def run(bound: Long): Set[(Long, Long)] =
      DedupOp.prefixJaccard(docsDF(docs), broadcastBytes = bound)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(Long.MaxValue) == want)
    assert(run(0L) == want)
  }
}
