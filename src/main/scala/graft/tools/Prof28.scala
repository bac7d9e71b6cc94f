package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof28 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.1")
    t("read docs")(docs.count())
    import graft.functions.TextFunctions._
    val sh = docs.select(col("doc_id"), explode(array_distinct(shingles(tokens(col("text"))))).as("sh"))
    t("docShingles")(sh.count())
    t("docShingles again")(sh.count())
    val byShingle = sh.groupBy(col("sh")).agg(sort_array(collect_list(col("doc_id"))).as("ds")).where(size(col("ds")) <= 64)
    t("byShingle")(byShingle.count())
    val pairs = graft.operators.DedupOp.ngramJaccard(docs, 0.5)
    t("full q28")(pairs.count())
    t("full q28 again")(pairs.count())
    spark.stop()
  }
}
