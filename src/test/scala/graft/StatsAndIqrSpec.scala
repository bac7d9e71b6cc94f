package graft

import graft.operators.{MetricStatsOp, OutlierOp}
import org.apache.spark.sql.functions._

/** Windowed-stats and IQR semantics lifted from the reference
  * (FIXTURES.md §B): population stdev, exact index quartiles, n≤4 ⇒ no
  * outliers, all-equal ⇒ no outliers.
  */
class StatsAndIqrSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("tumbling stats: stddev is population, not sample") {
    // two values in one 30s bucket: pop stdev of (1, 3) = 1.0; sample = sqrt(2)
    val df = Seq((ts(3), "a", 1.0), (ts(5), "a", 3.0))
      .toDF("ts", "event_type", "value")
    val out = MetricStatsOp.tumbling(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("bucket_ms") === 0L)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("avg_value") === 2.0)
    assert(r.getAs[Double]("std_value") === 1.0) // population
    assert(r.getAs[Double]("min_value") === 1.0)
    assert(r.getAs[Double]("max_value") === 3.0)
  }

  test("sliding stats: each event lands in size/slide windows") {
    val df = Seq((ts(15), "a", 2.0)).toDF("ts", "event_type", "value")
    val out = MetricStatsOp.sliding(df, "30 seconds", "10 seconds").collect()
    // event at t=15 belongs to windows starting at -10, 0, 10
    assert(out.map(_.getAs[Long]("bucket_ms")).toSeq ===
      Seq(-10000L, 0L, 10000L))
    assert(out.forall(_.getAs[Long]("n") === 1L))
  }

  test("windowed stats match a brute-force computation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (ts(rnd.nextInt(300).toLong), s"k${rnd.nextInt(3)}", rnd.nextDouble() * 100)
    }
    val got = MetricStatsOp.tumbling(rows.toDF("ts", "event_type", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val expected = rows.groupBy { case (t, k, _) =>
      ((t.getTime / 30000L) * 30000L, k)
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, vs) =>
      val xs = vs.map(_._3)
      val mean = xs.sum / xs.size
      val popStd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
      val (n, gmean, gstd) = got(key)
      assert(n === xs.size.toLong)
      // avg_value quantizes inputs to cents (DetAgg cross-engine
      // determinism): tolerance = max quantization bias + 4dp rounding
      assert(math.abs(gmean - mean) < 6e-3)
      assert(math.abs(gstd - popStd) < 2e-3)
    }
  }

  test("IQR: groups with n <= 4 flag nothing (reference ClusterAnalyser:158-159)") {
    val df = Seq(("g", 1.0), ("g", 100.0), ("g", 200.0), ("g", 9999.0))
      .toDF("k", "v")
    assert(OutlierOp.outliers(df, "k", "v").count() === 0)
  }

  test("IQR: all-equal values flag nothing (IQR = 0, band collapses to the value)") {
    val df = Seq.fill(10)(("g", 5.0)).toDF("k", "v")
    assert(OutlierOp.outliers(df, "k", "v").count() === 0)
  }

  test("IQR: index-based quartiles flag the planted extreme") {
    // sorted v = [1..9, 1000]; n=10: q1 = v[2] (0-based n/4=2) = 3,
    // q3 = v[(n/4)*3 = 6] = 7 (reference evaluates n/4*3 left-to-right)
    // iqr=4 -> band [-3.0, 13.0] -> only 1000 flagged
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = OutlierOp.outliers(df, "k", "v").select("v").as[Double].collect()
    assert(out.toSeq === Seq(1000.0))
  }

  test("IQR approx thresholds agree with exact on a smooth distribution") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map(_ => ("g", rnd.nextGaussian())).toDF("k", "v")
    val exact = OutlierOp.thresholds(df, "k", "v").collect().head
    val approx = OutlierOp.thresholdsApprox(df, "k", "v").collect().head
    assert(math.abs(exact.getAs[Double]("lo") - approx.getAs[Double]("lo")) < 0.1)
    assert(math.abs(exact.getAs[Double]("hi") - approx.getAs[Double]("hi")) < 0.1)
  }
}
