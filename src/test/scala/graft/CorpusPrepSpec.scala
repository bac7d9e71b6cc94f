package graft

import graft.operators.{DedupOp, ScaleOps, TextOps}
import org.apache.spark.sql.functions._

/** Semantic edge cases for the corpus-preparation tier (q67–q71):
  * decontamination exactness, repetition metrics, stopword strip,
  * split assignment, token-budget mixing. Oracle parity is covered by
  * QueriesSpec + the driver; these pin the SEMANTICS on planted data.
  */
class CorpusPrepSpec extends SparkSuite {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing a w-gram with the eval slice") {
    // doc 1 copies eval doc 0's 5-gram verbatim; doc 2 shares only
    // 4-gram prefixes (same first words — a prefix-hash would false-
    // positive here, exact strings must not); doc 3 is disjoint.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "eval"),
      (1L, "x alpha beta gamma delta epsilon y", "train"),
      (2L, "alpha beta gamma delta OTHER tail here", "train"),
      (3L, "one two three four five six seven", "train")
    ).toDF("doc_id", "text", "source")
    val out = DedupOp.decontaminate(docs, evalSource = "eval", w = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exactly one shared 5-gram: "alpha beta gamma delta epsilon"
    assert(out === Map(1L -> 1L))
  }

  test("repetition metrics: looped text scores high, distinct text scores zero") {
    val docs = Seq(
      (0L, "spam ham spam ham spam ham spam ham"), // one bigram pair looped
      (1L, "a b c d e f g h")                      // all bigrams unique
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // doc 0: 7 bigrams, 2 distinct ("spam ham"×4, "ham spam"×3);
    // DetAgg.ratio rounds HALF_UP at 4 decimals: 5/7→0.7143, 4/7→0.5714
    assert(m(0L)._1 === 7L)
    assert(m(0L)._2 === 0.7143)
    assert(m(0L)._3 === 0.5714)
    assert(m(1L)._2 === 0.0)
  }

  test("stopword strip: counts and fingerprint reflect the kept tokens only") {
    val docs = Seq((0L, "the quick fox is in a box")).toDF("doc_id", "text")
    val r = TextOps.stripStopwords(docs).collect().head
    assert(r.getLong(1) === 7L) // n_tokens
    assert(r.getLong(2) === 3L) // quick fox box
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("quick fox box".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getString(3) === expected)
  }

  test("split assign partitions every doc exactly once, stratified by source") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = ScaleOps.splitAssign(docs).collect()
    assert(out.map(_.getLong(2)).sum === docs.count())
    // every source present, and no (source, split) cell counted twice
    val cells = out.map(r => (r.getString(0), r.getString(1)))
    assert(cells.distinct.length === cells.length)
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("token commonness: rare tokens pull min_tf down, common ones lift avg_tf") {
    val docs = Seq(
      (0L, "common common common common"),
      (1L, "common common common rareword")
    ).toDF("doc_id", "text")
    val m = TextOps.tokenCommonness(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // "common" appears 7 times corpus-wide, "rareword" once
    assert(m(0L) === ((4L, 7L, 7.0)))
    assert(m(1L)._2 === 1L)         // min_tf exposes the rare token
    assert(m(1L)._3 === 5.5)        // (7*3 + 1) / 4
  }

  test("dup cluster sizes: a triple and a pair of identical docs histogram as 3 and 2") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "one two three four five"), (4L, "one two three four five"),
      (5L, "totally unrelated text here")
    ).toDF("doc_id", "text")
    val h = DedupOp.dupClusterSizes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h === Map(2L -> 1L, 3L -> 1L))
  }

  test("source overlap: cross-source dup pair lands in the right matrix cell") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "srcA"),
      (1L, "alpha beta gamma delta epsilon", "srcB"), // dup across sources
      (2L, "alpha beta gamma delta epsilon", "srcB"), // dup within srcB
      (3L, "one two three four five six", "srcC")
    ).toDF("doc_id", "text", "source")
    val m = DedupOp.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (0,1) A-B, (0,2) A-B, (1,2) B-B
    assert(m === Map(("srcA", "srcB") -> 2L, ("srcB", "srcB") -> 1L))
  }

  test("sequence pack: bins tile the concatenated token stream exactly") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = ScaleOps.sequencePack(docs, seqLen = 100L).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.length === docs.count())
    for ((source, rows) <- out.groupBy(_._1)) {
      // reconstruct: starts = bin*L + offset must be the running cumsum
      val sorted = rows.sortBy(r => r._3 * 100L + r._4)
      var cum = 0L
      for ((_, n, bin, off, spans) <- sorted) {
        assert(bin * 100L + off === cum, s"gap/overlap in $source at $cum")
        // spans_cut iff the doc crosses a 100-token boundary
        assert(spans === (if ((cum % 100) + n > 100) 1L else 0L))
        cum += n
      }
    }
  }

  test("token budget mix: per-source cumulative tokens never exceed the budget, " +
       "and the admitted set is a prefix of the hash order") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = ScaleOps.tokenBudgetMix(docs, budget = 300L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) <= 300L))
    // prefix property: for each source, admitted count == number of docs
    // whose hash-ordered running sum fits — re-derive independently
    val byDoc = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"),
        graft.functions.TextFunctions.portableHash(
          concat(reverse(col("doc_id").cast("string")), lit("|"),
            col("source"))).as("hk"))
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(0), r.getLong(2)))
    val expected = byDoc.groupBy(_._1).view.mapValues { ds =>
      var cum = 0L
      ds.sortBy(d => (d._2, d._3)).takeWhile { d =>
        cum += d._4; cum <= 300L
      }.map(_._3).toSet
    }.toMap
    val got = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(got === expected.filter(_._2.nonEmpty))
  }

  test("split leakage accounts for every near-dup pair exactly once") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = DedupOp.splitLeakage(docs).collect()
    // the matrix is a partition of the verified pair set
    assert(out.map(_.getLong(2)).sum === DedupOp.ngramJaccard(docs).count())
    val cells = out.map(r => (r.getString(0), r.getString(1)))
    assert(cells.distinct.length === cells.length)
    // unordered cells: lo <= hi lexicographically, labels are the splits
    assert(cells.forall { case (lo, hi) => lo <= hi })
    assert(cells.flatMap(c => Seq(c._1, c._2)).toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("ranked retrieval: AND semantics, integer tf-idf scoring, stable order") {
    val docs = Seq(
      (0L, "spark merge spark"),    // tf: spark 2, merge 1
      (1L, "spark only here"),      // missing 'merge' -> excluded
      (2L, "merge spark"),          // tf: 1, 1
      (3L, "nothing relevant")      // excluded
    ).toDF("doc_id", "text")
    val out = TextOps.rankedRetrieval(docs, Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // N=4, df(spark)=3, df(merge)=2; per-term score = tf*N*10000 DIV df
    // doc0 = 2*4*10000/3 + 1*4*10000/2 = 26666 + 20000; doc2 = 13333 + 20000
    assert(out.toSeq === Seq((0L, 2L, 46666L), (2L, 2L, 33333L)))
  }

  test("vocab coverage picks the minimal prefix, splitting tie classes exactly") {
    // counts: a=4, b=2, c=2, d=1 → total 9; classes (4→1, 2→2, 1→1)
    val docs = Seq((0L, "a a a a b b c c d")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(docs, thresholds = Seq(50, 90, 100))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // need(50) = ceil(4.5) = 5 → a + ONE of the two count-2 types: 2 types cover 6
    assert(out(50L) === ((2L, 6L, 9L)))
    // need(90) = ceil(8.1) = 9 → a + both count-2 types + d: all 4 types
    assert(out(90L) === ((4L, 9L, 9L)))
    assert(out(100L) === ((4L, 9L, 9L)))
  }
}
