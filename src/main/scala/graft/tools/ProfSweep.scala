package graft.tools


/** Dev harness: arm-family timings for the q85 recall sweep (ivf-only /
  * lsh-only / pq-only variants via reflection-free copies of the public
  * entry points). Not part of the driver contract.
  */
object ProfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ToolSession.build(cpus)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    import graft.operators.SimilarityOp
    t("annRecallMulti (q84: 1 ivf + 1 lsh arm)")(
      SimilarityOp.annRecallMulti(emb).count())
    t("full sweep (q85)")(SimilarityOp.annRecallSweep(emb).count())
    t("full sweep again")(SimilarityOp.annRecallSweep(emb).count())
    spark.stop()
  }
}
