package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash

/** Dev harness: stage-wise timing of the q156 prefix-filtered Jaccard
  * (same pipeline as DedupOp.prefixJaccard, inlined so each stage can
  * be counted in isolation). Not part of the driver contract.
  */
object ProfPrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ToolSession.build(cpus)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
    import graft.functions.TextFunctions.{tokens, shingles}
    // stage 1: the shingle stream (persisted, as in prefixJaccard)
    val d = docs.select(col("doc_id"),
      explode(array_distinct(transform(shingles(tokens(col("text")), 3),
        s => portableHash(s)))).as("hx")).persist()
    t("shingles count")(println(d.count()))
    // stage 2: df + per-doc sorted array (prefix source + verify side)
    val dfc = d.groupBy(col("hx")).agg(count(lit(1)).as("df"))
    val darr = d.join(dfc, Seq("hx"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("hx"))))
        .as("sarr"))
      .select(col("doc_id"),
        transform(col("sarr"), s => s.getField("hx")).as("arr"),
        size(col("sarr")).cast("long").as("n"))
      .persist()
    t("darr count")(println(darr.count()))
    val prefix = darr
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("arr"), lit(1),
          (call_function("div", col("n"), lit(2L)) + 1L).cast("int"))))
      .select(col("col").as("hx"), col("doc_id").as("pd"),
        col("n").as("pn"), (col("pos") + 1L).as("prk"))
    t("prefix count")(println(prefix.count()))
    // stage 3: prefix x prefix candidate join + filters + distinct
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
    // stage 3b: asymmetric probe-prefix x index-prefix (PPJoin index
    // reduction at t=1/2: index side only needs its first n/3+1)
    val iprefix = darr
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("arr"), lit(1),
          (call_function("div", col("n"), lit(3L)) + 1L).cast("int"))))
      .select(col("col").as("hx"), col("doc_id").as("fd"),
        col("n").as("fn"), (col("pos") + 1L).as("frk"))
    val candB = prefix
      .join(iprefix, Seq("hx"))
      .where((col("fn") < col("pn") ||
          (col("fn") === col("pn") && col("fd") < col("pd"))) &&
        col("fn") * 2L >= col("pn") &&
        lit(1L) + least(col("pn") - col("prk"), col("fn") - col("frk")) >=
          call_function("div", col("pn") + col("fn") + lit(2L), lit(3L)))
      .select(least(col("pd"), col("fd")).as("da"),
        greatest(col("pd"), col("fd")).as("db"))
      .distinct().persist()
    t("candB count")(println(candB.count()))
    // stage 4: array-intersect verification off the cached darr
    def verify(c: org.apache.spark.sql.DataFrame) = c
      .join(darr.select(col("doc_id").as("da"), col("arr").as("aa")),
        Seq("da"))
      .join(darr.select(col("doc_id").as("db"), col("arr").as("ab")),
        Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("aa"), col("ab"))).cast("long")
          .as("inter"),
        size(col("aa")).cast("long").as("na"),
        size(col("ab")).cast("long").as("nb"))
      .select(col("da"), col("db"),
        graft.functions.DetAgg.ratio(col("inter"),
          col("na") + col("nb") - col("inter")).as("jaccard"))
      .where(col("jaccard") >= 0.5)
    t("verify A count")(println(verify(cand).count()))
    t("verify B count")(println(verify(candB).count()))
    spark.stop()
  }
}
