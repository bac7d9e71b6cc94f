package graft.tools

/** Scratch A/B (r17 opt round) for the three conf-gated form changes:
  *
  *   - `fold`: recallArms rank step — BottomKExpr fold (new default)
  *     vs the row_number window (`spark.graft.recallArms.windowTopK`),
  *     over the four recall-audit consumers.
  *   - `txr`: textRank co-occurrence edge persist (new default) vs the
  *     lazy 22-scan nesting (`spark.graft.textrank.persistEdges`).
  *   - `tri`: frequentTriples scoped SHUFFLE_HASH hint on the basket
  *     self-join (new default) vs the stock sort-merge pick
  *     (`spark.graft.triples.smj`).
  *
  * Both forms of each pair run alternated in ONE JVM/window, order
  * flipped per round (the ProfDedup/ProfPin discipline).
  *
  * Usage: ProfR17 [sfDir] [rounds] [ops: fold,txr,tri]
  */
object ProfR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val ops: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("fold", "txr", "tri")
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.warmLayouts(spark, sfDir)

    def run(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def t(label: String, conf: String, v: Option[String])(q: String): Unit = {
      v match {
        case Some(x) => spark.conf.set(conf, x)
        case None => spark.conf.unset(conf)
      }
      val t0 = System.nanoTime()
      run(q)
      spark.catalog.clearCache()
      println(f"[profr17] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      v.foreach(_ => spark.conf.unset(conf))
    }
    // (op tag, conf restoring the OLD form, queries)
    val baskets = Seq(
      ("fold", "spark.graft.recallArms.windowTopK",
        Seq("q85_recall_sweep", "q84_ann_recall_multi", "q153_ann_mrr",
          "q157_ndcg")),
      ("txr", "spark.graft.textrank.persistEdges",
        Seq("q125_textrank")),
      ("tri", "spark.graft.triples.smj",
        Seq("q115_frequent_triples")),
    ).filter(b => ops.contains(b._1))
    val oldVal = Map("fold" -> "true", "txr" -> "false", "tri" -> "true")
    for (r <- 1 to rounds; (tag, conf, qs) <- baskets; q <- qs) {
      val short = q.split("_")(0)
      if (r % 2 == 1) {
        t(s"$tag/$short old r$r", conf, Some(oldVal(tag)))(q)
        t(s"$tag/$short new r$r", conf, None)(q)
      } else {
        t(s"$tag/$short new r$r", conf, None)(q)
        t(s"$tag/$short old r$r", conf, Some(oldVal(tag)))(q)
      }
    }
    spark.stop()
  }
}
