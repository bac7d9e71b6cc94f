package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling harness for q188's ×30 cost decomposition: sig
  * computation, the Hamming pair expansion alone, the bottom-k fold,
  * the GT path, and the exact rerank, timed separately in one JVM.
  *
  * Usage: Prof188 [sfDir] [qmod] [c]
  */
object Prof188 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1x30"
    val qmod = if (args.length > 1) args(1).toInt else 7
    val c = if (args.length > 2) args(2).toInt else 100
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.tables.Tables.embeddings(spark, sfDir)

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof188] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Console.out.flush()
    }

    // sign bits, the q188 construction
    def sigs = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("v") > 0f,
        expr("shiftleft(1L, CAST(d AS INT))")).otherwise(0L)).as("sig"))
    def qsigs = sigs.where(col("vec_id") % qmod === 0)
      .select(col("vec_id").as("qid"), col("sig").as("qsig"))
    def keyed = sigs.join(broadcast(qsigs), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("long").as("key"))

    for (pass <- 1 to 2) {
      t(s"sigs_noop p$pass")(sigs.write.format("noop").mode("overwrite").save())
      t(s"pairs_noop p$pass")(keyed.write.format("noop").mode("overwrite").save())
      // NOTE: the default-conf fold control at this volume dies in the
      // sort fallback (observed: silent JVM death at ×30, c=100) — the
      // lifted form below is the production path and the only timed one
      t(s"fold_lifted_c$c p$pass") {
        keyed.createOrReplaceGlobalTempView("prof188_keyed")
        val s2 = spark.newSession()
        s2.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "262144")
        s2.table("global_temp.prof188_keyed").groupBy(col("qid"))
          .agg(graft.functions.BottomKExpr.column(
            col("key"), col("vec_id"), lit(0d), c).as("top"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
