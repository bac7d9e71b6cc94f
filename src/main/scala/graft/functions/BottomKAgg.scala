package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** One sampled observation: portable hash (the sampling key), the
  * unique row id (tie-break), and the carried value. */
case class SampleRow(hx: Long, id: Long, v: Double)

/** Bounded bottom-k-by-hash sample — the KMV/bottom-k sketch from the
  * distinct-counting literature used as a MERGEABLE uniform group
  * sampler: keep the k rows with the smallest (portable-hash, id)
  * keys. Because the hash is a deterministic function of the row, the
  * sample is (a) uniform (the hash plays the PRNG), (b) identical
  * across engines (the oracle re-derives it with the same hash), and
  * (c) mergeable — bottom-k of a union is bottom-k of the per-part
  * bottom-k's, which is what makes it a SKETCH: every map-side partial
  * is bounded at k rows regardless of partition size, so a group's
  * sample costs k·|partitions| shuffled rows where exact quantiles
  * would shuffle every row (the [[graft.operators.OutlierOp]]
  * collect-sort path) or trade determinism for error bounds
  * (`percentile_approx`). Mergeability is unit-proven in
  * BottomKAggSpec; cross-engine identity is the q158 oracle gate.
  *
  * The buffer is kept sorted ascending by (hx, id); `reduce` is O(1)
  * for rows that miss the current bottom-k (the overwhelming majority
  * once the buffer fills) and O(k) otherwise.
  *
  * `distinctKeys = true` gives SET semantics — a row whose (hx, id)
  * key already sits in the buffer is dropped instead of duplicated.
  * That is the KMV (k-minimum-values) sketch of the distinct-counting
  * literature: the k smallest DISTINCT hash values, from which
  * (k−1)·M / h_k estimates the distinct count (q162).
  */
class BottomKAgg(k: Int, distinctKeys: Boolean = false)
    extends Aggregator[SampleRow, Seq[SampleRow], Seq[SampleRow]] {
  require(k >= 1 && k <= 4096, s"BottomKAgg: k=$k out of range")

  private def lt(a: SampleRow, b: SampleRow): Boolean =
    a.hx < b.hx || (a.hx == b.hx && a.id < b.id)
  private def keyEq(a: SampleRow, b: SampleRow): Boolean =
    a.hx == b.hx && a.id == b.id

  override def zero: Seq[SampleRow] = Vector.empty

  override def reduce(b: Seq[SampleRow], a: SampleRow): Seq[SampleRow] =
    if (b.length >= k && !lt(a, b.last)) b
    else {
      val (lo, hi) = b.span(lt(_, a))
      if (distinctKeys && hi.nonEmpty && keyEq(hi.head, a)) b
      else ((lo :+ a) ++ hi).take(k)
    }

  override def merge(x: Seq[SampleRow], y: Seq[SampleRow]): Seq[SampleRow] = {
    // linear merge of two sorted runs, truncated at k
    val out = Vector.newBuilder[SampleRow]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.length || j < y.length)) {
      val takeX = j >= y.length || (i < x.length && lt(x(i), y(j)))
      if (!takeX && distinctKeys && i < x.length && keyEq(x(i), y(j))) {
        j += 1 // same key on both sides: emit once (the x copy, next turn)
      } else {
        out += (if (takeX) { i += 1; x(i - 1) } else { j += 1; y(j - 1) })
        n += 1
      }
    }
    out.result()
  }

  override def finish(r: Seq[SampleRow]): Seq[SampleRow] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()
}
