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

  test("q32 error band: approx thresholds within the accuracy-implied " +
       "rank band of q07's exact quartiles on the events table") {
    // q32 is rows-only in the driver gate (percentile_approx has no
    // exact cross-engine oracle); this spec value-bounds it against its
    // exact twin q07. percentile_approx at accuracy a has rank error
    // ≤ n/a, so each approx quartile must fall between the exact values
    // at ranks floor/ceil(q·(n−1)) ∓ ceil(n/a) — a distribution-free
    // band, checked per event_type on real data.
    import org.apache.spark.sql.functions.{col, collect_list, sort_array}
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val approx = OutlierOp.thresholdsApprox(ev, "event_type", "value")
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val groups = ev.groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .collect()
    assert(groups.nonEmpty)
    groups.foreach { r =>
      val vs = r.getSeq[Double](1)
      val n = vs.size
      val slack = math.max(1, math.ceil(n / 10000.0).toInt)
      def bandOf(q: Double): (Double, Double) = {
        val loIdx = math.max(0, math.floor(q * (n - 1)).toInt - slack)
        val hiIdx = math.min(n - 1, math.ceil(q * (n - 1)).toInt + slack)
        (vs(loIdx), vs(hiIdx))
      }
      val row = approx(r.getAs[String]("event_type"))
      // recover the approx quartiles from lo/hi: lo = 2.5·q1 − 1.5·q3,
      // hi = 2.5·q3 − 1.5·q1 ⇒ q1 = (5·lo + 3·hi)/8, q3 = (3·lo + 5·hi)/8
      val lo = row.getAs[Double]("lo"); val hi = row.getAs[Double]("hi")
      val q1 = (5 * lo + 3 * hi) / 8; val q3 = (3 * lo + 5 * hi) / 8
      val (b1l, b1h) = bandOf(0.25); val (b3l, b3h) = bandOf(0.75)
      assert(q1 >= b1l - 1e-9 && q1 <= b1h + 1e-9,
        s"${r.get(0)}: approx q1 $q1 outside exact band [$b1l, $b1h]")
      assert(q3 >= b3l - 1e-9 && q3 <= b3h + 1e-9,
        s"${r.get(0)}: approx q3 $q3 outside exact band [$b3l, $b3h]")
    }
  }

  test("overflow guards: ANSI is on, long overflow fails loud, and the " +
       "promoted decimal paths stay exact past 2^63") {
    // The q232 mean-squares class stays in BIGINT with documented
    // headroom; its guard is ANSI failing LOUD, never wrapping —
    // assert both the config and the behavior.
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val thrown = intercept[Exception] {
      Seq(Long.MaxValue).toDF("x").select($"x" + 1L).collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("overflow"))

    // Spearman's promoted moment path (q164): corrPpm over
    // DECIMAL(38,0) sums past 2^63 must equal the same kernel computed
    // in BigInt→double on the driver. Moments are a valid rank triple
    // scaled to push sxx/syy/sxy beyond long range.
    import graft.functions.DetAgg
    val n = BigInt(4000000)                       // past the 1.9M bound
    val sx = n * n                                // Σ2r̄ for distinct ranks = n(n+1) ≈ n²
    val sxx = n * n * n * 4 / 3                   // ≈ (4/3)n³ > 2^63
    val sxy = sxx - n * 1000                      // slightly off-diagonal
    val row = Seq(1).toDF("one").select(
      DetAgg.corrPpm(lit(n.toString).cast("decimal(38,0)"),
        lit(sx.toString).cast("decimal(38,0)"),
        lit(sx.toString).cast("decimal(38,0)"),
        lit(sxx.toString).cast("decimal(38,0)"),
        lit(sxx.toString).cast("decimal(38,0)"),
        lit(sxy.toString).cast("decimal(38,0)")).as("rho"))
      .collect().head
    assert(sxx > BigInt(Long.MaxValue))
    val nd = n.toDouble; val sxd = sx.toDouble
    val sxxd = sxx.toDouble; val sxyd = sxy.toDouble
    val num = nd * sxyd - sxd * sxd
    val den = nd * sxxd - sxd * sxd
    val expected = math.floor(num / math.sqrt(den * den) * 1e6 + 0.5).toLong
    assert(row.getAs[Long]("rho") === expected)

    // q199's promoted variance numerator: halfUpDiv over DECIMAL(38,0)
    // past 2^63 must equal BigInt floor((2num+den)/(2den)).
    val bigNum = BigInt("92233720368547758080123")   // ~1e22 > 2^63
    val bigDen = BigInt("12345678901234567")
    val got = Seq(1).toDF("one").select(
      DetAgg.halfUpDiv(lit(bigNum.toString).cast("decimal(38,0)"),
        lit(bigDen.toString).cast("decimal(38,0)")).cast("long").as("d"))
      .collect().head.getAs[Long]("d")
    val x = bigNum * 2 + bigDen; val d2 = bigDen * 2
    val expectedDiv = ((x - (((x % d2) + d2) % d2)) / d2).toLong
    assert(got === expectedDiv)
  }

  test("q57-style HLL counts within the rsd-implied band of q33's exact " +
       "distinct users") {
    // q57 is rows-only in the driver gate (the HLL sketch is
    // engine-specific); this value-bounds the same approx_count_distinct
    // at rsd = 0.02 against q33's exact countDistinct on the events
    // table: |approx − exact| ≤ 3·rsd·exact (≈3σ of the HLL estimator).
    import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct}
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val both = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val e = r.getAs[Long]("exact"); val a = r.getAs[Long]("approx")
      assert(math.abs(a - e) <= math.max(1.0, 3 * 0.02 * e),
        s"${r.get(0)}: approx $a vs exact $e outside 3-sigma band")
    }
  }
}
