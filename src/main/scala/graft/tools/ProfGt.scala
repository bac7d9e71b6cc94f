package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling harness for the ANN-layout ingest A/B (round 14
  * session 3): the exact-GT and trunc-candidate builders moved from a
  * row_number window over the full |Q|·|N| scored expansion to the
  * bounded BottomKAgg sketch ([[graft.operators.SimilarityOp
  * .topKPerQuery]]). Times both forms on a (scaled) input dir —
  * the window form shuffles every pair; the sketch form shuffles
  * ≤ |parts|·|Q|·k partial rows.
  *
  * Usage: ProfGt [sfDir]
  */
object ProfGt {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1x30"
    val spark = ToolSession.build("32")
    val emb = graft.tables.Tables.embeddings(spark, sfDir)

    def t(name: String, reps: Int = 2)(f: => Unit): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        f
        println(f"[profgt] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val sketchOnly = args.contains("sketchonly")
    if (!sketchOnly) t("gt_q7_window") {
      graft.operators.SimilarityOp.exactTopKMultiRankedWindow(emb, 7, 10)
        .write.format("noop").mode("overwrite").save()
    }
    t("gt_q7_sketch") {
      graft.operators.SimilarityOp.exactTopKMultiRanked(emb, 7, 10)
        .write.format("noop").mode("overwrite").save()
    }
    if (!sketchOnly) t("trunc_d16_window") {
      graft.operators.SimilarityOp.truncCandidatesMultiWindow(emb, 7, 16, 50)
        .write.format("noop").mode("overwrite").save()
    }
    t("trunc_d16_sketch") {
      graft.operators.SimilarityOp.truncCandidatesMulti(emb, 7, 16, 50)
        .write.format("noop").mode("overwrite").save()
    }
    // Does lifting the ObjectHashAggregate sort-based fallback (default
    // 128 keys — every GT map task holds |Q| ≈ 8.5k sketch buffers, so
    // it always falls back to a local sort of its pair rows) buy
    // anything? Buffers are k-bounded, so the hash path is safe here.
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
    t("gt_q7_sketch_hifallback") {
      graft.operators.SimilarityOp.exactTopKMultiRanked(emb, 7, 10)
        .write.format("noop").mode("overwrite").save()
    }
    t("trunc_d16_sketch_hifallback") {
      graft.operators.SimilarityOp.truncCandidatesMulti(emb, 7, 16, 50)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
