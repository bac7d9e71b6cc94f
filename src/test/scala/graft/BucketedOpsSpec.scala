package graft

import graft.operators.BucketedOps
import graft.functions.DetAgg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Bucketed-table co-located join: the plan must prove the shuffle and
  * sort are gone, and the layout must not change a single output row.
  */
class BucketedOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graft-bucketed").toString

  private lazy val orders = (1L to 200L)
    .map(k => (k, s"${1 + (k % 5)}-P${k % 5}"))
    .toDF("o_orderkey", "o_orderpriority")
  private lazy val lineitem = (1L to 600L)
    .map(i => (1L + i % 200L, 100.0 + (i % 50).toDouble, 0.01 * (i % 10)))
    .toDF("l_orderkey", "l_extendedprice", "l_discount")

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-located join: sort-merge join with zero exchange, zero sort") {
    BucketedOps.writeBucketed(orders, "t_orders_b", "o_orderkey", wh, 8)
    BucketedOps.writeBucketed(lineitem, "t_lineitem_b", "l_orderkey", wh, 8)
    // broadcast off so the join can't dodge the question; AQE off so
    // executedPlan is the bare physical plan, inspectable pre-execution.
    // The sort-free read additionally needs the scan to expose the
    // per-bucket sortBy ordering, which Spark 3+ gates behind the
    // legacy flag (SPARK-28595) and the one-file-per-bucket layout
    // writeBucketed guarantees; without the flag only the exchange
    // disappears.
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.adaptive.enabled" -> "false",
             "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val joined = BucketedOps.colocatedJoin(spark, "t_orders_b", "t_lineitem_b")
      val plan: SparkPlan = joined.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"one-file-per-bucket sortBy scan must not re-sort:\n$plan")
      assert(joined.count() === 600L)
    }
  }

  test("partitioned layout: source filter becomes pure directory pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = Seq(
      (1L, 10L, "srcA"), (2L, 20L, "srcA"),
      (3L, 30L, "srcB"), (4L, 40L, "srcC")
    ).toDF("doc_id", "n_chars", "source")
    BucketedOps.writePartitioned(docs, "t_docs_parted", "source", wh)
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val pruned = BucketedOps.prunedScan(spark, "t_docs_parted", Seq("srcA", "srcC"))
      val scans = pruned.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      // the IN filter must live in PartitionFilters — and leave NO
      // per-row data filter behind (it is satisfied by pruning alone)
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"filter did not reach PartitionFilters:\n${pruned.queryExecution}")
      assert(scans.forall(_.dataFilters.isEmpty),
        s"source filter leaked into per-row dataFilters:\n${pruned.queryExecution}")
      assert(pruned.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
    }
  }

  test("dpp scan: runtime dim filter reaches the fact PartitionFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // source names follow the real corpus ("src"+nationkey) so the
    // nation-driven dim intersects them
    val docs = (1L to 40L)
      .map(i => (i, 10L * i, s"src${i % 8}"))
      .toDF("doc_id", "n_chars", "source")
    // the dim must be a FILE scan: an in-memory Seq becomes a
    // LocalRelation whose filter constant-folds away, and with no
    // Filter node on the dim side the planner never considers DPP
    (0 to 24).map(_.toLong).toDF("n_nationkey")
      .write.mode("overwrite").parquet(s"$wh/nation_pq")
    val nation = spark.read.parquet(s"$wh/nation_pq")
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val joined = BucketedOps.dppScan(docs, nation, wh)
      val scans = joined.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .filter(_.relation.partitionSchema.nonEmpty)
      assert(scans.nonEmpty, s"no partitioned fact scan:\n${joined.queryExecution}")
      // the dim's hash-parity filter is NOT foldable to source literals,
      // so pruning must arrive as a runtime dynamicpruning subquery
      assert(scans.exists(_.partitionFilters.exists(
          _.toString.contains("dynamicpruning"))),
        s"no dynamic pruning subquery in the fact scan:\n${joined.queryExecution}")
      // and the result equals the plain predicate evaluated directly
      val expected = docs
        .where(graft.functions.TextFunctions.portableHash(col("source"))
          % 2L === 1L)
        .select("doc_id").as[Long].collect().toSet
      assert(joined.select("doc_id").as[Long].collect().toSet === expected)
      assert(expected.nonEmpty && expected.size < 40)
    }
  }

  test("bucketing changes the plan, not the result") {
    val out = BucketedOps.bucketedOrderRevenue(orders, lineitem, wh, 8)
      .collect().toSeq
    val direct = orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        DetAgg.sumDiscounted2(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(out === direct)
  }

  test("morton interleave matches a bit-twiddled Scala reference") {
    import graft.operators.BucketedOps
    def ref(x: Long, y: Long): Long =
      (0 until 8).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.sum
    val pairs = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L),
      (170L, 85L), (85L, 170L), (200L, 13L))
    val df = pairs.toDF("b1", "b2")
      .selectExpr("b1", "b2",
        BucketedOps.mortonSql("b1", "b2", "DIV") + " AS m")
    df.collect().foreach { r =>
      assert(r.getLong(2) === ref(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // z-curve locality sanity: interleave of (255,255) is the max code
    assert(ref(255L, 255L) === 65535L)
  }
}
