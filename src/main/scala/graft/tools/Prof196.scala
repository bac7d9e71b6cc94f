package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling harness for the q196 Theil–Sen selection A/B
  * (round 14): times the hourly aggregate, the pair expansion, the
  * old rank-window selection, the r14 histogram selection, and a
  * two-pass bucket selection against each other in one JVM/window.
  */
object Prof196 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.build("32")
    import org.apache.spark.sql.expressions.Window

    def t(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[prof196] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val events = graft.tables.Tables.events(spark, sfDir)
    val h = events.select(col("event_type"),
        (expr("unix_millis(ts)") / 3600000L).cast("long").as("hr"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("hr"))
      .agg(graft.functions.DetAgg.halfUpDiv(sum(col("c")) * 100L,
        count(lit(1))).as("m"))
    val a = h.select(col("event_type"), col("hr").as("hi"), col("m").as("mi"))
    val b = h.select(col("event_type"), col("hr").as("hj"), col("m").as("mj"))
    def slopes = a.join(b, Seq("event_type"))
      .where(col("hi") < col("hj"))
      .select(col("event_type"), col("hi"), col("hj"),
        graft.functions.DetAgg.halfUpDiv(
          (col("mj") - col("mi")) * 1000000L,
          col("hj") - col("hi")).as("sp"))

    t("hourly_agg")(h.write.format("noop").mode("overwrite").save())
    t("pairs_only")(slopes.write.format("noop").mode("overwrite").save())

    def oldForm = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("sp"), col("hi"), col("hj"))
      slopes
        .withColumn("rn", row_number().over(w))
        .withColumn("np",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .where(col("rn") === expr("(np + 1L) DIV 2L"))
        .select(col("event_type"), col("np").as("n_pairs"),
          col("sp").as("sen_slope_ppm"))
        .orderBy("event_type")
    }
    def histForm = {
      val hist = slopes.groupBy(col("event_type"), col("sp"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("sp"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("np",
          sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
        .where(col("cum") >= expr("(np + 1L) DIV 2L") &&
          col("cum") - col("cnt") < expr("(np + 1L) DIV 2L"))
        .select(col("event_type"), col("np").as("n_pairs"),
          col("sp").as("sen_slope_ppm"))
        .orderBy("event_type")
    }
    def bucketForm = {
      val sl = slopes.select(col("event_type"), col("sp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sl.count()
      val shift = 16
      val bhist = sl
        .select(col("event_type"), shiftright(col("sp"), shift).as("bk"))
        .groupBy(col("event_type"), col("bk"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("bk"))
      val sel = bhist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("np",
          sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
        .where(col("cum") >= expr("(np + 1L) DIV 2L") &&
          col("cum") - col("cnt") < expr("(np + 1L) DIV 2L"))
        .select(col("event_type"), col("bk"),
          (col("cum") - col("cnt")).as("before"), col("np"))
      val w2 = Window.partitionBy(col("event_type")).orderBy(col("sp"))
      val out = sl
        .join(broadcast(sel), Seq("event_type"))
        .where(shiftright(col("sp"), shift) === col("bk"))
        .withColumn("rn", row_number().over(w2))
        .where(col("rn") === expr("(np + 1L) DIV 2L - before"))
        .select(col("event_type"), col("np").as("n_pairs"),
          col("sp").as("sen_slope_ppm"))
        .orderBy("event_type")
      out.write.format("noop").mode("overwrite").save()
      sl.unpersist()
    }

    t("old_rank_window")(oldForm.write.format("noop").mode("overwrite").save())
    t("hist_selection")(histForm.write.format("noop").mode("overwrite").save())
    t("bucket_two_pass")(bucketForm)
    println("[prof196] old result:   " + oldForm.collect().mkString(" "))
    println("[prof196] hist result:  " + histForm.collect().mkString(" "))
    spark.stop()
  }
}
