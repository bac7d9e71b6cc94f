package graft

import java.sql.Timestamp

import graft.operators.{EventOps, ScaleOps, SimilarityOp, TextOps}

/** Crafted-fixture semantics for the q202–q208 tier: bigram-LM scoring
  * (cap/OOV convention), overlapping phrase matches, serpentine shard
  * balance, ceil-rank hourly percentiles, mutual-kNN hub filtering,
  * gaps-and-islands streaks, and rank-tie quantile normalization.
  */
class PhraseShardPercentileSpec extends SparkSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("bigramLmScore: exact conditional ppm means on a known corpus") {
    // unigrams: a=4, b=2; bigrams: (a b)=2, (b a)=1, (a a)=1
    val docs = docsOf(0L -> "a b a b", 1L -> "a a")
    val out = TextOps.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // doc0 bigrams: ab=1e6*2/4, ba=1e6*1/2, ab → all 500000
    assert(out(0L) === ((3L, 500000.0, 500000L)))
    // doc1: aa = 1e6*1/4 = 250000
    assert(out(1L) === ((1L, 250000.0, 250000L)))
  }

  test("bigramLmScore: pairs outside the topK caps score 0 (OOV)") {
    val docs = docsOf(0L -> "a b a b", 1L -> "a a")
    // cap=1 keeps only unigram `a` and bigram (a b); (b a) and (a a)
    // fall outside the broadcast vocab and score 0 by convention
    val out = TextOps.bigramLmScore(docs, topK = 1).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    // doc0: 500000, 0, 500000 → halfUp(1e10/3)/1e4 = 333333.3333
    assert(out(0L) === ((333333.3333, 0L)))
    assert(out(1L) === ((0.0, 0L)))
  }

  test("phraseSearch counts overlapping matches and 1-based first_pos") {
    val docs = docsOf(
      0L -> "data table data table",  // matches at tokens 1 and 3
      1L -> "table data",             // reversed — no match
      2L -> "x data table y")         // one interior match
    val out = TextOps.phraseSearch(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0L -> ((2L, 1L)), 2L -> ((1L, 2L))))
  }

  test("shardAssign: serpentine deal balances a linear size gradient") {
    // 16 docs with 16..1 tokens over 8 shards: every shard gets 17
    val docs = (0 until 16).map { i =>
      (i.toLong, Seq.fill(16 - i)("w").mkString(" "))
    }
    val out = ScaleOps.shardAssign(docsOf(docs: _*)).collect()
    assert(out.length === 8)
    assert(out.forall(_.getLong(1) === 2L))                 // n_docs
    assert(out.forall(_.getLong(2) === 17L))                // total_tokens
    assert(out.forall(_.getLong(3) === 125000L))            // 1e6/8
  }

  test("hourlyPercentiles: ceil-rank order statistics within one hour") {
    val h0 = 1700000000000L // some hour-aligned-ish epoch ms base
    val evs = (1 to 10).map { i =>
      (i.toLong, new Timestamp(h0 + i * 1000L), 1L, "view", i / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.hourlyPercentiles(evs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 0.05) // rank ⌈10/2⌉=5 (ceil via (n+1) DIV 2)
    assert(r.getDouble(3) === 0.09) // rank ⌈0.9·10⌉ = 9
    assert(r.getDouble(4) === 0.10) // rank ⌈0.99·10⌉ = 10
  }

  test("mutualKnn at k=1 keeps only reciprocal pairs (hub filtered)") {
    // a=(1,0); b and c sit symmetrically ±θ around a, so both pick a
    // as nearest, but a's single slot goes to b (tie → smaller id):
    // (a,b) mutual, (a,c) not, (b,c) not.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.99f, 0.1f), 0),
      (6L, Array(0.99f, -0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOp.mutualKnn(emb, qmod = 3, k = 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 3L)))
    assert(out.head.getLong(3) === 1L && out.head.getLong(4) === 1L)
  }

  test("activityStreaks: islands split on hour gaps") {
    val base = 1700000000000L - (1700000000000L % 3600000L)
    def at(hr: Long) = new Timestamp(base + hr * 3600000L + 60000L)
    val hours = Seq(0L, 1L, 2L, 5L, 7L, 8L)
    val evs = hours.zipWithIndex.map { case (h, i) =>
      (i.toLong, at(h), 42L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.activityStreaks(evs).collect().head
    assert(r.getLong(1) === 6L) // active hours
    assert(r.getLong(2) === 3L) // islands: {0,1,2} {5} {7,8}
    assert(r.getLong(3) === 3L) // longest streak
  }

  test("quantileNormAudit: min-rank ties normalize equally") {
    val emb = Seq(
      (1L, Array(1.0f, 5.0f), 0),
      (2L, Array(2.0f, 5.0f), 0),
      (3L, Array(3.0f, 7.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOp.quantileNormAudit(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // dim0 norms: 0, 500000, 1e6; dim1 (5,5 tie → rank 1): 0, 0, 1e6
    assert(out(1L) === ((500000.0, 0L, 0L)))
    assert(out(2L) === ((250000.0, 0L, 500000L)))
    assert(out(3L) === ((500000.0, 1000000L, 1000000L)))
  }

  test("quantileNormAudit: a single-vector corpus normalizes to 0 ppm " +
       "instead of dividing by n-1 = 0") {
    val emb = Seq((1L, Array(1.0f, 5.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOp.quantileNormAudit(emb).collect()
    assert(out.length === 1)
    val r = out.head
    // n = 1: every rank is 1, the clamped denominator maps it to 0 ppm
    assert((r.getDouble(1), r.getLong(2), r.getLong(3)) ===
      ((500000.0, 0L, 0L)))
  }
}
