package graft.tools


/** Scratch A/B for the q85 sweep's signature layout (round 14):
  * untagged (all arms compute corpus signatures live) vs tagged (the
  * three new-family arms read the write-once signature table), same
  * JVM/window, steady ×3 each.
  */
object Prof85 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.build("32")
    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    val wh = "/tmp/graft_warehouse"
    // pre-build the layouts both variants share (exact GT) + the sigs
    graft.operators.SimilarityOp.exactTopKTable(emb, wh, 29, Some(sfDir))
    graft.operators.SimilarityOp.signSketchSigsTable(emb, wh,
      inputTag = Some(sfDir))
    def t(name: String)(f: => Unit): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[prof85] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    t("live")(graft.operators.SimilarityOp
      .annRecallSweep(emb, warehouse = wh, inputTag = Some(sfDir),
        sigLayout = false)
      .write.format("noop").mode("overwrite").save())
    t("layout")(graft.operators.SimilarityOp
      .annRecallSweep(emb, warehouse = wh, inputTag = Some(sfDir))
      .write.format("noop").mode("overwrite").save())
    t("live2")(graft.operators.SimilarityOp
      .annRecallSweep(emb, warehouse = wh, inputTag = Some(sfDir),
        sigLayout = false)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
