package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE SparkEntry query by name — time it like Bench
  * does (noop sink, warm pass at the tiny sf first) and optionally dump
  * the formatted plan. Not part of the driver contract.
  *
  * Usage: RunOne <query> [sfDir] [--explain] [--show]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunOne <query> [sfDir]"))
    val sfDir = args.drop(1).find(!_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
    if (args.contains("--show")) fn(spark, sfDir).show(50, truncate = false)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[runone] $name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
