package graft

import org.apache.spark.sql.functions._
import graft.operators.{AuditOps, EventOps, SimilarityOp}

/** Constructed-data tests for the round-8 session-3 additions: the
  * binary-quantization recall arm (q188), hourly-series ACF (q189),
  * and the Poisson-bootstrap CI (q190). The corpus-level hash gates
  * prove engine parity; these pin the arithmetic on cases with
  * hand-computed exact answers.
  */
class BootstrapAcfBinSpec extends SparkSuite {
  import spark.implicits._

  test("binaryQuantRecall: sign-bit shortlist retrieves the exact top-k on an orthant corpus") {
    // 2-D corpus; qid 0 = (1,1). Sign bits: bit d set iff v_d > 0
    // (STRICTLY — vec 5's 0.0 x-component leaves bit 0 unset).
    //   sig: v0=(1,1)→3, v1=(0.9,1.1)→3, v2=(−1,1)→2, v3=(1,−1)→1,
    //        v4=(−1,−1)→0, v5=(0.0,2.0)→2
    // Hamming to q: v1→0, {v2,v3,v5}→1, v4→2. c=3 shortlist (ties by
    // vec_id): v1, v2, v3. Exact top-3 by cosine: v1 (≈1), then the
    // orthogonal pair v2/v3 (0.0, id order) — v5 (cos≈0.707) BEATS
    // them in the true ranking, so recall@3 = 2/3 ≈ 0.6667: the audit
    // correctly charges the binary index for quantizing v5 into the
    // wrong orthant.
    val emb = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(0.9f, 1.1f)),
      (2L, Seq(-1.0f, 1.0f)), (3L, Seq(1.0f, -1.0f)),
      (4L, Seq(-1.0f, -1.0f)), (5L, Seq(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOp.binaryQuantRecall(emb, qmod = 7, k = 3,
      cs = Seq(3)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "bin1bit_c003")
    assert(r.getLong(1) === 1L)           // one query (vec_id 0)
    assert(r.getDouble(2) === 3.0)        // mean_cand = c
    assert(r.getDouble(3) === 0.6667)     // 2/3 half-up at scale 4
  }

  test("hourlyAcf: linear series gives acf_ppm = 1e6; an hour gap only drops pairs") {
    import org.apache.spark.sql.functions.timestamp_millis
    // one event per hour h ∈ {0..9} \ {5}, value = h dollars → hourly
    // mean m = h·10000 centi-cents, linear in hr. Lag-1 pairs need BOTH
    // hours: (0,1)(1,2)(2,3)(3,4)(6,7)(7,8)(8,9) → 7 pairs, still
    // perfectly linear → Pearson exactly 1.
    val events = (Seq(0, 1, 2, 3, 4, 6, 7, 8, 9).map { h =>
      (h.toLong, h.toLong * 3600000L, 1L, "a", h.toDouble)
    }).toDF("event_id", "ms", "user_id", "event_type", "value")
      .select($"event_id", timestamp_millis($"ms").as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
    val out = EventOps.hourlyAcf(events, lags = Seq(1, 2)).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((7L, 1000000L)))
    // lag 2: pairs with both hours present are (0,2)(1,3)(2,4)(4,6)
    // (6,8)(7,9) — the missing hour 5 kills (3,5) and (5,7) → 6 pairs,
    // still linear.
    assert(out(2L) === ((6L, 1000000L)))
  }

  test("bootstrapCi: constant prices collapse the CI to the point mean with zero SE") {
    val orders = (1L to 50L).map(k => (k, "1-URGENT", 123.45))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = AuditOps.bootstrapCi(orders).collect().head
    assert(r.getString(0) === "1-URGENT")
    assert(r.getLong(1) === 50L)          // n_orders
    assert(r.getLong(2) === 12345L)       // point mean cents
    assert(r.getLong(3) === 64L)          // all resamples non-empty
    assert(r.getLong(4) === 12345L)       // lo
    assert(r.getLong(5) === 12345L)       // hi
    assert(r.getLong(6) === 0L)           // se
  }

  test("bootstrapCi: spread prices give lo <= point <= hi ordering and positive SE") {
    val orders = (1L to 200L).map(k => (k, "G", (k % 10) * 100.0 + 1.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = AuditOps.bootstrapCi(orders).collect().head
    val (lo, hi, se) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(lo < hi)
    assert(lo <= r.getLong(2) && r.getLong(2) <= hi)
    assert(se > 0L)
  }
}
