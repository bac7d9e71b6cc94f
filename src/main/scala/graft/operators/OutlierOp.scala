package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IQR-based outlier detection (reference use case 3, the non-ML half).
  *
  * Semantics from `traffic/process/ClusterAnalyser.scala:157-170` (index
  * quartiles) and `:50-60` (threshold join + flag): per group, sort the
  * values, Q1 = v[n/4], Q3 = v[n/4*3] (0-based integer indices; the
  * reference's `v.length / 4 * 3` evaluates left-to-right, so Q3 is
  * (n/4)*3, NOT (3n)/4 — they differ whenever n % 4 != 0), threshold
  * band = [Q1 - 1.5·IQR, Q3 + 1.5·IQR]; groups with n ≤ 4 flag nothing
  * (`ClusterAnalyser.scala:158-159`).
  *
  * The quartiles are exact index-based (NOT percentile_approx) for
  * bit-parity with the reference and the DuckDB oracle. The per-group
  * sorted list is one `sort_array(collect_list(...))` — fine while a
  * single group's values fit an executor; the at-scale variant is
  * `approxQuantile`/`percentile_approx`, provided as [[thresholdsApprox]].
  */
object OutlierOp {

  /** Per-group lo/hi IQR thresholds, exact index-based quartiles. */
  def thresholds(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(col(valCol))).as("vs"),
           count(lit(1)).as("n"))
      .select(col(keyCol), col("n"),
        element_at(col("vs"), (expr("n DIV 4") + 1).cast("int")).as("q1"),
        element_at(col("vs"), (expr("n DIV 4") * 3 + 1).cast("int")).as("q3"))
      .select(col(keyCol), col("n"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))

  /** Scale path: same band from approximate quartiles (no per-group
    * collect; mergeable sketches, bounded memory at any cardinality).
    */
  def thresholdsApprox(df: DataFrame, keyCol: String, valCol: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valCol), array(lit(0.25), lit(0.75)),
             lit(accuracy)).as("qs"),
           count(lit(1)).as("n"))
      .select(col(keyCol), col("n"),
        (element_at(col("qs"), 1)
          - (element_at(col("qs"), 2) - element_at(col("qs"), 1)) * 1.5).as("lo"),
        (element_at(col("qs"), 2)
          + (element_at(col("qs"), 2) - element_at(col("qs"), 1)) * 1.5).as("hi"))

  /** Rows outside the per-group IQR band; groups with n ≤ 4 emit nothing.
    * The thresholds side is tiny (one row per group) so it broadcasts —
    * no shuffle of the fact side.
    */
  def outliers(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val th = thresholds(df, keyCol, valCol)
    df.join(broadcast(th), keyCol)
      .where(col("n") > 4 &&
        (col(valCol) < col("lo") || col(valCol) > col("hi")))
  }

  /** Median-absolute-deviation outliers — the robust-statistics sibling
    * of the IQR band (MAD has a 50% breakdown point vs 25%; standard in
    * data-quality gates where a heavy-tailed metric would drag the
    * quartiles). Per group: med = lower median (exact 1-indexed
    * `(n+1) DIV 2` — NOT percentile_approx), MAD = median of
    * |v − med|, outlier ⇔ |v − med| > k·MAD, MAD > 0, n > 4.
    *
    * Everything is exact index picks and identical float expression
    * trees on both engines — bit-deterministic with NO rounding.
    * Plan shape: two small aggregate→broadcast rounds (one per median);
    * the fact side never shuffles.
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(col(valCol))).as("vs"),
           count(lit(1)).as("n"))
      .select(col(keyCol), col("n"),
        element_at(col("vs"), expr("(n + 1) DIV 2").cast("int")).as("med"))
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(col(keyCol).as("__k"))
      .agg(sort_array(collect_list(col("__dev"))).as("ds"),
           count(lit(1)).as("nn"))
      .select(col("__k"),
        element_at(col("ds"), expr("(nn + 1) DIV 2").cast("int")).as("mad"))
    dev.join(broadcast(mad), col(keyCol) === col("__k"))
      .where(col("n") > 4 && col("mad") > 0.0 && col("__dev") > col("mad") * k)
  }

  /** The reference's J3 variant (`_analyse`,
    * `ClusterAnalyser.scala:101-120`): thresholds computed INSIDE each
    * group — collect, band, explode back — no join at all. Same result
    * as [[outliers]] (one oracle covers both), different physical plan:
    * one shuffle total, but each group's rows materialize in one task —
    * prefer [[outliers]] when groups can be huge, this one when the
    * group count dwarfs per-group size.
    */
  def outliersGrouped(df: DataFrame, idCol: String, keyCol: String,
                      valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(collect_list(struct(col(idCol).as("id"), col(valCol).as("v"))).as("rows"),
           sort_array(collect_list(col(valCol))).as("vs"),
           count(lit(1)).as("n"))
      .select(col(keyCol), col("n"), col("rows"),
        element_at(col("vs"), (expr("n DIV 4") + 1).cast("int")).as("q1"),
        element_at(col("vs"), (expr("n DIV 4") * 3 + 1).cast("int")).as("q3"))
      .select(col(keyCol), col("n"), col("rows"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
      .select(col(keyCol), col("n"), col("lo"), col("hi"),
        explode(col("rows")).as("r"))
      .where(col("n") > 4 && (col("r.v") < col("lo") || col("r.v") > col("hi")))
      .select(col("r.id").as(idCol), col(keyCol), col("r.v").as(valCol))

  /** Winsorized robust stats — clip the price distribution at exact
    * index percentiles (rank ⌊n·p/100⌋ + 1, 1-based) and report the
    * clipped-tail counts plus the winsorized sum, ALL in exact cents:
    * the robust-mean prep step that stops a handful of fat-finger
    * amounts from dragging every downstream average. The two tail
    * values are found WITHOUT a global row_number: the p-th smallest is
    * `max` over an ascending sort-limit (and the high tail `min` over a
    * descending one) — Spark executes sort+limit+agg as
    * TakeOrdered(k), so only the ≈n/100 tail rows ever leave the
    * executors. At 100 TB even a 1 % tail is too big for one task —
    * switch to `approx_percentile` bounds or a two-pass value-range
    * bucket count (the q32 exact/approx dual stance); this form is the
    * exact gate-checkable one.
    */
  def winsorizedStats(lineitem: DataFrame, pLo: Int = 1,
                      pHi: Int = 99): DataFrame = {
    require(0 < pLo && pLo < pHi && pHi < 100, "winsorizedStats: bad bounds")
    val v = lineitem
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("vc"))
    val n = v.count()
    val loK = (n * pLo / 100 + 1).toInt
    val hiK = (n - (n * pHi / 100 + 1) + 1).toInt
    val loF = v.orderBy(col("vc").asc).limit(loK)
      .agg(max(col("vc")).as("lo_cents"))
    val hiF = v.orderBy(col("vc").desc).limit(hiK)
      .agg(min(col("vc")).as("hi_cents"))
    v.crossJoin(broadcast(loF)).crossJoin(broadcast(hiF))
      .groupBy(col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("vc") < col("lo_cents"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("vc") > col("hi_cents"), 1L).otherwise(0L)).as("n_hi"),
        sum(greatest(least(col("vc"), col("hi_cents")), col("lo_cents")))
          .as("sum_winsorized_cents"))
      .select(col("n"), col("lo_cents"), col("hi_cents"),
        col("n_lo"), col("n_hi"), col("sum_winsorized_cents"))
  }

  /** Oracle SQL twin of [[winsorizedStats]] — same 1-based index-rank
    * percentile definition, spelled with row_number (oracle-side only;
    * the Spark plan deliberately avoids the global window). */
  def winsorizedStatsOracle(pLo: Int = 1, pHi: Int = 99): String =
    s"""WITH v AS (
       |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS vc
       |  FROM lineitem
       |), nn AS (SELECT count(*) AS n FROM v),
       |r AS (SELECT vc, row_number() OVER (ORDER BY vc) AS rn FROM v),
       |lo AS (SELECT vc AS lo_cents FROM r, nn
       |       WHERE rn = n * $pLo // 100 + 1),
       |hi AS (SELECT vc AS hi_cents FROM r, nn
       |       WHERE rn = n * $pHi // 100 + 1)
       |SELECT nn.n, lo.lo_cents, hi.hi_cents,
       |  (SELECT CAST(sum(CASE WHEN vc < lo_cents THEN 1 ELSE 0 END)
       |     AS BIGINT) FROM v, lo) AS n_lo,
       |  (SELECT CAST(sum(CASE WHEN vc > hi_cents THEN 1 ELSE 0 END)
       |     AS BIGINT) FROM v, hi) AS n_hi,
       |  (SELECT CAST(sum(greatest(least(vc, hi_cents), lo_cents))
       |     AS BIGINT) FROM v, lo, hi) AS sum_winsorized_cents
       |FROM nn, lo, hi""".stripMargin
}
