package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling harness for the q125 TextRank edge-persist A/B
  * (round 14 session 3): the co-occurrence edge frame feeds every
  * PageRank superstep's `ed` join AND the degree/count frames, so the
  * corpus explode+aggregate appears several times in the final lazy
  * plan. Measures (a) textRank as shipped (exchange reuse only),
  * (b) the same loop over an eagerly persisted edge frame.
  */
object Prof125 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.build("32")

    def t(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"[prof125] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val docs = graft.tables.Tables.documents(spark, sfDir)

    // A: shipped form
    t("textrank_shipped") {
      graft.operators.TextOps.textRank(docs)
        .write.format("noop").mode("overwrite").save()
    }

    // B: persisted co-occurrence edges (persist + eager count, then
    // the identical rank loop; unpersist after the action)
    t("textrank_persist_edges") {
      val edges = graft.operators.TextOps.tokenCooccurrence(docs)
        .select(col("tok_a").as("src"), col("tok_b").as("dst"))
        .persist()
      edges.count()
      graft.operators.GraphOps.pageRankRanks(edges, 3)
        .select(col("node").as("token"), col("r").as("rank_ppb"))
        .orderBy(col("rank_ppb").desc, col("token"))
        .limit(20)
        .write.format("noop").mode("overwrite").save()
      edges.unpersist()
    }

    // C: how much is the cooc edge build alone?
    t("cooc_edges_only") {
      graft.operators.TextOps.tokenCooccurrence(docs)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
