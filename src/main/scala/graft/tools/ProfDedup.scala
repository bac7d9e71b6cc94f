package graft.tools

/** Scratch A/B (r16 opt round) for the recallArms dedup-score question:
  * the arms' tagged candidate union scores shared (qid, vec_id) pairs
  * once per CONFIG under the shipped form; the candidate variant scores
  * the DISTINCT pairs once and joins the sims back, trading duplicated
  * map-side codegen cosine for one extra exchange of the candidate
  * frame. Both forms produce identical values (same sim per pair, same
  * rank window); the switch is the runtime conf
  * `spark.graft.recallArms.dedupScore`, flipped between timed calls in
  * ONE JVM/window, order alternated per round.
  *
  * Usage: ProfDedup [sfDir] [rounds]
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")
    // pre-build the shared write-once layouts so every timed call is
    // the serve-time shape the bench measures
    graft.SparkEntry.warmLayouts(spark, sfDir)

    val qs = Seq("q85_recall_sweep", "q84_ann_recall_multi",
      "q153_ann_mrr", "q157_ndcg")
    def run(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def t(name: String, dedup: Boolean)(q: String): Unit = {
      spark.conf.set("spark.graft.recallArms.dedupScore", dedup.toString)
      val t0 = System.nanoTime()
      run(q)
      spark.catalog.clearCache()
      println(f"[profdedup] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to rounds; q <- qs) {
      val tag = q.split("_")(0)
      if (r % 2 == 1) {
        t(s"$tag base  r$r", dedup = false)(q)
        t(s"$tag dedup r$r", dedup = true)(q)
      } else {
        t(s"$tag dedup r$r", dedup = true)(q)
        t(s"$tag base  r$r", dedup = false)(q)
      }
    }
    spark.stop()
  }
}
