package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.portableHash

/** Dev harness: stage-wise timing of the q156 prefix-filtered Jaccard
  * (same pipeline as DedupOp.prefixJaccard, inlined so each stage can
  * be counted in isolation). Not part of the driver contract.
  */
object ProfPrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
    import graft.functions.TextFunctions.{tokens, shingles}
    val d = docs.select(col("doc_id"),
      explode(array_distinct(transform(shingles(tokens(col("text")), 3),
        s => portableHash(s)))).as("hx")).persist()
    t("shingles count")(d.count())
    val dfc = d.groupBy(col("hx")).agg(count(lit(1)).as("df"))
    val sizes = d.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("hx"))
    val prefix = d.join(dfc, Seq("hx"))
      .join(sizes, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= call_function("div", col("n"), lit(2L)) + 1L)
      .select(col("hx"), col("doc_id").as("pd"), col("n").as("pn"),
        col("rk").as("prk"))
      .persist()
    t("prefix count")(println(prefix.count()))
    val cand = prefix
      .join(prefix.select(col("hx"), col("pd").as("fd"),
        col("pn").as("fn"), col("prk").as("frk")), Seq("hx"))
      .where(col("pd") < col("fd") &&
        least(col("pn"), col("fn")) * 2L >= greatest(col("pn"), col("fn")) &&
        lit(1L) + least(col("pn") - col("prk"), col("fn") - col("frk")) >=
          call_function("div", col("pn") + col("fn") + lit(2L), lit(3L)))
      .select(col("pd").as("da"), col("fd").as("db"))
      .distinct().persist()
    t("cand count")(println(cand.count()))
    val inter = cand
      .join(d.select(col("doc_id").as("da"), col("hx")), Seq("da"))
      .join(d.select(col("doc_id").as("db"), col("hx")), Seq("db", "hx"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    t("inter count")(println(inter.count()))
    // variant B: broadcast sorted-array intersection
    val docArr = d.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("hx"))).as("arr"))
    val interB = cand
      .join(broadcast(docArr.select(col("doc_id").as("da"), col("arr").as("aa"))), Seq("da"))
      .join(broadcast(docArr.select(col("doc_id").as("db"), col("arr").as("ab"))), Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("aa"), col("ab"))).cast("long").as("inter"))
    t("interB count")(println(interB.count()))
    t("interB again")(println(interB.count()))
    val out = inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        graft.functions.DetAgg.ratio(col("inter"),
          col("na") + col("nb") - col("inter")).as("jaccard"))
      .where(col("jaccard") >= 0.5)
    t("final count")(println(out.count()))
    spark.stop()
  }
}
