package graft.tools

import org.apache.spark.sql.functions._

/** Scratch breakdown of q85's cost (round 14): times each arm
  * family's candidate generation separately, then the shared rerank,
  * in one JVM/window.
  */
object Prof85b {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.build("32")
    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    val wh = "/tmp/graft_warehouse"
    import graft.operators.SimilarityOp
    SimilarityOp.exactTopKTable(emb, wh, 29, Some(sfDir))
    SimilarityOp.signSketchSigsTable(emb, wh, inputTag = Some(sfDir))
    def t(name: String)(f: => Any): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[prof85b] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    // private pieces reached through the public sweep with arm subsets
    // is not possible; approximate by timing the public queries that
    // wrap each family
    t("q84_two_arms")(SimilarityOp.annRecallMulti(emb, inputTag = Some(sfDir))
      .collect().length)
    t("q139_trunc")(SimilarityOp.truncRecall(emb, inputTag = Some(sfDir))
      .collect().length)
    t("q188_bin")(SimilarityOp.binaryQuantRecall(emb, inputTag = Some(sfDir))
      .collect().length)
    t("q85_sweep")(SimilarityOp.annRecallSweep(emb, inputTag = Some(sfDir))
      .collect().length)
    spark.stop()
  }
}
