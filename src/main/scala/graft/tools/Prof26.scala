package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling harness for the q26 MinHash-LSH ×30 scaling
  * question (r16 second session): steady wall read 3.1 s (×1) /
  * 2.8 s (×10) / 25.0 s (×30) on the docs-mode rehearsal dirs — flat
  * then a 9× jump for 3× docs. Band signatures are 4 concatenated
  * 64-bit-range minima, so cross-copy bucket collisions are
  * ~impossible and candidate volume is ×N by construction; the jump
  * must be a stage, not the data. Decomposes the operator into its
  * stages and counts each one's output so the guilty stage is named,
  * not guessed.
  */
object Prof26 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.build("32")

    def t(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[prof26] $name run$i: $s%.2f s" +
          (r match { case n: Long => s"  (count=$n)"
                     case t: String => s"  ($t)"; case _ => "" }))
      }
    }

    val docs = graft.tables.Tables.documents(spark, sfDir)
    val op = graft.operators.DedupOp

    t("signatures_count") { op.minhashSignatures(docs).count() }

    t("full_q26") {
      op.minhashLsh(docs, 0.5).write.format("noop")
        .mode("overwrite").save(); ()
    }

    t("pairs_out_count") { op.minhashLsh(docs, 0.5).count() }

    // are the extra ×30 pairs cross-copy (stride 1M) or within-copy?
    t("cross_copy_pairs") {
      op.minhashLsh(docs, 0.5)
        .where(expr("da DIV 1000000 != db DIV 1000000")).count()
    }

    // within-copy pairs by suffix-length cohort: copies 1-9 carry a
    // 2-char token suffix ("_7"), copies 10+ a 3-char one ("_17") —
    // if the 3-char cohort is inflated, the 8-char-prefix portable
    // hash is losing shingle entropy to the suffix, a testdata
    // construction artifact rather than an operator scale defect.
    t("pairs_by_cohort") {
      op.minhashLsh(docs, 0.5)
        .where(expr("da DIV 1000000 = db DIV 1000000"))
        .groupBy(expr("case when da DIV 1000000 = 0 then 0 " +
          "when da DIV 1000000 < 10 then 2 else 3 end as cohort"))
        .count().orderBy("cohort").collect()
        .map(r => s"suffixlen${r.getInt(0)}=${r.getLong(1)}")
        .mkString(" ")
    }

    spark.stop()
  }
}
