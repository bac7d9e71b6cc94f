package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the r15 serve-time |Q|·|N| fold (q206
  * family): times the expansion floor, the shipped sketch fold (default
  * conf → ObjectHashAggregate sort fallback at serve |Q|), the same
  * fold on a CHILD session carrying the lifted fallback threshold
  * (hash-mode bounded buffers — the layout builders' shape, made
  * serve-safe by session isolation instead of conf mutation), and the
  * two-pass coarse-bucket selection, in one JVM/window.
  *
  * Usage: Prof206 [sfDir] [qmod] [k]
  */
object Prof206 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1x30"
    val qmod = if (args.length > 1) args(1).toInt else 3
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = ToolSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    val parts = spark.sessionState.conf.numShufflePartitions
    val sub = emb.where(col("vec_id") % qmod === 0)
    val q = sub.select(col("vec_id").as("qid"),
      graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("qv"))
    def scored = sub
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .repartition(parts)
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.CosineExpr.column(col("qv"), col("v")), 6)
          .as("sim"))
      .where(!isnan(col("sim")))

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof206] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Console.out.flush()
    }

    def sketchFold(df: DataFrame): DataFrame = {
      val bottomK = udaf(new graft.functions.BottomKAgg(k))
      df.groupBy(col("qid"))
        .agg(bottomK(
          -round(col("sim") * lit(1e6), 0).cast("long"),
          col("vec_id"), col("sim")).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("p", "r")))
    }

    for (pass <- 1 to 2) {
      t(s"expansion_noop p$pass")(
        scored.write.format("noop").mode("overwrite").save())

      t(s"sketch_default p$pass")(
        sketchFold(scored).write.format("noop").mode("overwrite").save())

      // child session carrying the lifted fallback threshold; the pair
      // frame crosses sessions via a global temp view
      t(s"sketch_lifted p$pass") {
        scored.createOrReplaceGlobalTempView("prof206_scored")
        val s2 = spark.newSession()
        s2.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "262144")
        sketchFold(s2.table("global_temp.prof206_scored"))
          .write.format("noop").mode("overwrite").save()
      }

      for (shift <- Seq(16)) {
        val keyed = scored.withColumn("key",
          -round(col("sim") * lit(1e6), 0).cast("long"))
        val bucket = shiftright(col("key"), shift)
        val hist = keyed.groupBy(col("qid"), bucket.as("bk"))
          .agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy(col("qid")).orderBy(col("bk"))
        val want = least(lit(k.toLong), col("nq"))
        val sel = hist
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("nq",
            sum(col("cnt")).over(Window.partitionBy(col("qid"))))
          .where(col("cum") >= want && col("cum") - col("cnt") < want)
          .select(col("qid"), col("bk").as("bk_th"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("key"), col("vec_id"))
        val full = keyed.join(broadcast(sel), Seq("qid"))
          .where(bucket <= col("bk_th"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= k).drop("bk_th")
        t(s"twopass_s$shift p$pass")(
          full.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
