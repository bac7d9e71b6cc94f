package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Skew/bucketing scale patterns: salted join semantics and bucketed
  * co-located joins (no shuffle in the plan).
  */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result on skewed data") {
    val rnd = new scala.util.Random(3)
    // 90% of rows hit key 1 (the skew), rest spread over 2..5
    val large = (1 to 5000).map { i =>
      (if (rnd.nextDouble() < 0.9) 1L else 2L + rnd.nextInt(4), i.toLong)
    }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"))
      .toDF("k", "label")
    val plain = large.join(small, "k")
      .select($"k", $"payload", $"label").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = RelationalOps.saltedJoin(large, small, "k", salts = 8)
      .select($"k", $"payload", $"label").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted === plain)
    assert(plain.size === 5000)
  }

  test("bucketed tables join without a shuffle exchange") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_a")
      (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }
}
