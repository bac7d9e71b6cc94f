package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time bpeMerges per k. Not part of the driver contract. */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, sfDir)
    for (k <- Seq(1, 2, 3, 4, 5, 6)) {
      val t0 = System.nanoTime()
      graft.operators.TextOps.bpeMerges(docs, k).collect()
      println(f"[bpetime] k=$k: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
