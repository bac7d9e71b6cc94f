package graft

import graft.operators.{RelationalOps, ScaleOps, TextOps}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Agreement bounds for the approx-binned rank arms (q251–q254)
  * against their exact global-rank siblings at sf0.01 — the spec the
  * round-9 verdict asked for: the binned arms exist because exact
  * rank single-threads a global sort at 100×, and these tests pin how
  * much resolution the sampled boundaries give up at the SF where
  * both arms are cheap to run.
  */
class BinnedRankSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"

  test("rfmSegmentsBinned: every customer within one quintile of exact") {
    val orders = Tables.orders(spark, dir)
    val ex = RelationalOps.rfmPerCustomer(orders)
      .select(col("o_custkey"), col("rb").as("erb"),
        col("fb").as("efb"), col("mb").as("emb"))
    val ap = RelationalOps.rfmPerCustomerBinned(orders)
      .select(col("o_custkey"), col("rb"), col("fb"), col("mb"))
    assert(ap.count() === ex.count()) // every customer assigned once
    val d = ex.join(ap, "o_custkey")
      .agg(max(abs(col("rb") - col("erb"))).as("dr"),
        max(abs(col("fb") - col("efb"))).as("df"),
        max(abs(col("mb") - col("emb"))).as("dm"))
      .head
    info(s"max quintile deltas: rec=${d.getLong(0)} " +
      s"freq=${d.getLong(1)} mon=${d.getLong(2)}")
    assert(d.getLong(0) <= 1, "recency bucket off by more than one")
    assert(d.getLong(1) <= 1, "frequency bucket off by more than one")
    assert(d.getLong(2) <= 1, "monetary bucket off by more than one")
  }

  test("abcBinned: every part within one class of exact, totals conserved") {
    val li = Tables.lineitem(spark, dir)
    val ex = RelationalOps.abcPerPart(li)
      .select(col("l_partkey"), col("rev"), col("cls").as("ecls"))
    val bin = RelationalOps.abcPerBin(li)
      .select(col("bin"), col("cls"))
    // re-join parts to their bin's class through the revenue interval:
    // per-bin cum bounds aren't needed — rev bins are contiguous, so
    // ranking parts by rev and bins by bin reproduces the assignment
    val perBinned = ScaleOps.binAssign(
      RelationalOps.abcPerFrame(li),
      ScaleOps.sampledBinIntervals(
        RelationalOps.abcPerFrame(li),
        graft.functions.TextFunctions.portableHash(
          reverse(col("l_partkey").cast("string"))),
        col("l_partkey"), col("rev"), bins = 64, k = 256),
      col("rev"))
      .join(bin, "bin")
    assert(perBinned.count() === ex.count())
    val toNum = (c: org.apache.spark.sql.Column) =>
      when(c === "A", 1).when(c === "B", 2).otherwise(3)
    val d = ex.join(perBinned.select(col("l_partkey"), col("cls")),
        "l_partkey")
      .agg(max(abs(toNum(col("cls")) - toNum(col("ecls")))).as("dc"))
      .head.getInt(0)
    info(s"max class distance: $d")
    assert(d <= 1, "a part moved more than one ABC class")
  }

  test("shardAssignBinned: token shares near-uniform, doc/token totals conserved") {
    val docs = Tables.documents(spark, dir)
    val ex = ScaleOps.shardAssign(docs).collect()
    val ap = ScaleOps.shardAssignBinned(docs).collect()
    assert(ap.map(_.getLong(1)).sum === ex.map(_.getLong(1)).sum)
    assert(ap.map(_.getLong(2)).sum === ex.map(_.getLong(2)).sum)
    val dev = ap.map(r => math.abs(r.getLong(3) - 125000L)).max
    val exDev = ex.map(r => math.abs(r.getLong(3) - 125000L)).max
    info(s"max |share-1/8| ppm: binned=$dev exact=$exDev")
    // the exact serpentine deal is near-perfect; the binned deal pays
    // per-bin remainder noise that shrinks as docs/bin grows — at 500
    // docs over 64 bins it measures ~22k ppm (2.2 % absolute)
    assert(dev <= 40000L, s"binned shard imbalance $dev ppm")
  }

  test("qualityEnsembleBinned: each doc's bin tracks its exact rank percentile") {
    val docs = Tables.documents(spark, dir)
    val sig = TextOps.qualitySignals(docs)
    val n = sig.count()
    def pct(c: String) = (row_number()
      .over(Window.orderBy(col(c), col("doc_id"))).cast("double") / n)
    val ex = sig
      .withColumn("p_uniq", pct("uniq_ratio"))
      .withColumn("p_stop", pct("stop_ratio"))
      .withColumn("p_len", pct("n_tokens"))
      .select(col("doc_id"), col("p_uniq"), col("p_stop"), col("p_len"))
    val ap = TextOps.qualityBinnedFrame(docs)
      .select(col("doc_id"), col("b_uniq"), col("b_stop"), col("b_len"))
    assert(ap.count() === n) // one bin triple per doc
    val bins = 64.0
    // Ties: a run of equal signal values lands in ONE bin but spans a
    // rank RANGE — so measure each doc's bin against its tie run's
    // [min, max] percentile, not a single rank (stop_ratio at small
    // token counts has runs ~8 % wide; that spread is the data's, not
    // the sampling's).
    val j = ex.join(ap, "doc_id")
    def rangeDist(sigDf: org.apache.spark.sql.DataFrame, v: String,
                  p: String, b: String): Double = {
      val rng = sigDf.groupBy(col(v))
        .agg(min(col(p)).as("plo"), max(col(p)).as("phi"))
      sigDf.join(rng, v)
        .select(greatest(lit(0.0), col("plo") - col(b) / bins,
          col(b) / bins - col("phi")).as("d"))
        .agg(max(col("d"))).head.getDouble(0)
    }
    val withSig = j.join(sig, "doc_id")
    val du = rangeDist(withSig, "uniq_ratio", "p_uniq", "b_uniq")
    val ds = rangeDist(withSig, "stop_ratio", "p_stop", "b_stop")
    val dl = rangeDist(withSig, "n_tokens", "p_len", "b_len")
    info(f"max dist(bin/64, tie-run pct range): uniq=$du%.4f " +
      f"stop=$ds%.4f len=$dl%.4f")
    // within three bucket widths: one for bin quantization plus ~two
    // for boundary sampling error — a k=256-of-500 bottom-k sample has
    // ECDF standard error ≈ 0.022, and the max over 63 boundaries
    // measures ≈ 0.034 (2.2 buckets) at sf0.01; error shrinks as 1/√k
    // while bucket width stays 1/bins
    for ((d, nm) <- Seq(du -> "uniq", ds -> "stop", dl -> "len"))
      assert(d <= 3.0 / 64.0, s"$nm drifted past three bucket widths: $d")
  }

  test("binned arms plan with no row-level window at all") {
    // the POINT of the binned arms: assignment is broadcast joins, so
    // the physical plan has no Window operator over the entity frames
    // (the exact arms have three / one unpartitioned ones); abcBinned
    // and shardAssignBinned keep windows only over the ≤bins-row
    // rollup / partitioned-by-bin frames, checked by shape above
    val orders = Tables.orders(spark, dir)
    val docs = Tables.documents(spark, dir)
    for (df <- Seq(RelationalOps.rfmPerCustomerBinned(orders),
        TextOps.qualityBinnedFrame(docs))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Window"), "unexpected Window in binned plan")
    }
  }
}
