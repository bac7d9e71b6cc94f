package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric two-sample / paired tests and changepoint location —
  * the experiment-analysis tier that does not assume normal spend
  * distributions (event values are heavy-tailed at every sf, so the
  * t-statistic family under-powers; rank statistics are the standard
  * robust alternative).
  *
  * All three operators follow the repo's rank-statistic discipline
  * (see [[AuditOps.spearman]]): ranks are AVERAGE ranks in DOUBLED form
  * (2·r̄ = 2·cumcount − tiecount + 1 over the VALUE HISTOGRAM, exact
  * integers under ties), and every reported ratio goes through
  * [[graft.functions.DetAgg]] so both engines divide identical
  * integers. Building ranks from the per-group value histogram rather
  * than per-row windows keeps the shuffled frame at |distinct values|
  * rows — the same reason spearmanOracle uses histogram ranks.
  */
object StatTestOps {

  private def cents(c: String): Column =
    expr(s"CAST(round(($c) * 100) AS BIGINT)")

  /** Mann–Whitney U (Wilcoxon rank-sum) per event type, arms split by
    * user-id parity — the distribution-free "did arm B's spend shift?"
    * test, plus Cliff's delta as the effect size ((U_a − U_b)/(n_a·n_b),
    * the probability-of-superiority difference; reported in ppm).
    *
    * Doubled rank sums keep everything integral under ties:
    * 2U = 2R − n(n+1), U_a + U_b = n_a·n_b (identity holds exactly with
    * average ranks). `tie_term` = Σ(t³ − t) over value multiplicities
    * is the variance-correction input a consumer needs for the normal
    * approximation — reported raw so no libm sqrt enters the gate.
    *
    * Scale shape: one map-side-combined groupBy to the (type, value)
    * histogram, then a cumulative window keyed by event type over
    * |distinct cents| rows (HashPartitioning(et) satisfies both the
    * cumsum and the final rollup — one shuffle of narrow longs). Linear
    * rank sums bound every aggregate by 2n² < 2⁶³ to n ≈ 2·10⁹ rows per
    * event type (≈ sf10⁵). The tie term cubes a VALUE MULTIPLICITY
    * (cnt³ overflows 2⁶³ once any single cents value is held by ~2.1M
    * rows — plausible at large sf for a modal price), so cnt promotes
    * to DECIMAL(38,0)/HUGEINT before cubing, the [[AuditOps.spearman]]
    * Σ(2r̄)² convention, and casts back to BIGINT after the sum.
    */
  def mannWhitney(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val base = events.select(col("event_type").as("et"),
      cents("value").as("x"),
      pmod(col("user_id"), lit(2L)).as("arm"))
    val h = base.groupBy(col("et"), col("x"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"))
    // Doubled average rank of every row holding value x. The cumsum's
    // default RANGE frame is tie-safe: x is distinct after the groupBy.
    val r = h.withColumn("r2",
      sum(col("cnt")).over(Window.partitionBy(col("et")).orderBy(col("x")))
        * 2L - col("cnt") + 1L)
    val u2a = col("r2a") - col("n_a") * (col("n_a") + 1L)
    val u2b = col("r2b") - col("n_b") * (col("n_b") + 1L)
    r.groupBy(col("et")).agg(
        sum(col("ca")).as("n_a"),
        sum(col("cnt") - col("ca")).as("n_b"),
        sum(col("ca") * col("r2")).as("r2a"),
        sum((col("cnt") - col("ca")) * col("r2")).as("r2b"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
          - col("cnt")).cast("long").as("tie_term"))
      .select(col("et").as("event_type"), col("n_a"), col("n_b"),
        u2a.as("u2_a"), u2b.as("u2_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          halfUpDiv((u2a - u2b) * 500000L, col("n_a") * col("n_b")))
          .as("delta_ppm"),
        col("tie_term"))
      .orderBy("event_type")
  }

  /** Oracle SQL twin of [[mannWhitney]] — identical histogram-rank
    * construction. */
  def mannWhitneyOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH b AS (
       |  SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS x,
       |    user_id % 2 AS arm
       |  FROM events
       |), h AS (
       |  SELECT et, x, count(*) AS cnt,
       |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca
       |  FROM b GROUP BY 1, 2
       |), r AS (
       |  SELECT et, cnt, ca,
       |    CAST(sum(cnt) OVER (PARTITION BY et ORDER BY x) * 2
       |      - cnt + 1 AS BIGINT) AS r2
       |  FROM h
       |), m AS (
       |  SELECT et,
       |    CAST(sum(ca) AS BIGINT) AS n_a,
       |    CAST(sum(cnt - ca) AS BIGINT) AS n_b,
       |    CAST(sum(ca * r2) AS BIGINT) AS r2a,
       |    CAST(sum((cnt - ca) * r2) AS BIGINT) AS r2b,
       |    CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS BIGINT)
       |      AS tie_term
       |  FROM r GROUP BY 1
       |)
       |SELECT et AS event_type, n_a, n_b,
       |  r2a - n_a * (n_a + 1) AS u2_a,
       |  r2b - n_b * (n_b + 1) AS u2_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${halfUpDivSql(
             "((r2a - n_a * (n_a + 1)) - (r2b - n_b * (n_b + 1))) * 500000",
             "n_a * n_b")}
       |  END AS delta_ppm,
       |  tie_term
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** Wilcoxon signed-rank over paired per-user purchase spend: each
    * user's total purchase cents in the second half of the observed
    * purchase time range vs the first (split at the integer midpoint of
    * [min ts, max ts], a 1-row broadcast) — "did per-user spend shift
    * between the halves, ignoring who the big spenders are?". Zero
    * differences drop (the standard Wilcoxon convention; their count is
    * reported), |d| gets doubled average ranks from the difference
    * histogram, and the rank-biserial effect size
    * (W⁺ − W⁻)/(W⁺ + W⁻) is reported in ppm.
    *
    * Scale shape: the paired frame is ONE ROW PER PURCHASING USER —
    * orders of magnitude below the event count — and ranking runs over
    * the |distinct |d|| histogram of that frame. The cumulative window
    * is unpartitioned by construction (a global rank statistic), but
    * over the histogram, not the users; at 100× the |d| histogram is
    * what a binned-rank arm would sample ([[ScaleOps.sampledBinIntervals]]
    * is the established escape hatch if it ever grows past one task).
    */
  def wilcoxonSigned(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_millis(ts)").as("ms"),
        cents("value").as("c"))
    // Post-1970 data: min+max is positive, so truncating DIV == floor
    // in both engines (the floorDivMs concern does not arise).
    val mid = p.agg(
      expr("CAST((min(ms) + max(ms)) DIV 2 AS BIGINT)").as("mid"))
    val d = p.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ms") <= col("mid"), col("c")).otherwise(0L)).as("s1"),
        sum(when(col("ms") > col("mid"), col("c")).otherwise(0L)).as("s2"))
      .select((col("s2") - col("s1")).as("d"))
    val zeros = d.where(col("d") === 0L)
      .agg(count(lit(1)).as("n_zero"))
    val h = d.where(col("d") =!= 0L)
      .groupBy(abs(col("d")).as("ad"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("d") > 0L, 1L).otherwise(0L)).as("cpos"))
    val r = h.withColumn("r2",
      sum(col("cnt")).over(Window.orderBy(col("ad"))) * 2L - col("cnt") + 1L)
    r.agg(
        sum(col("cnt")).as("n_pairs"),
        sum(col("cpos") * col("r2")).as("w2_plus"),
        sum((col("cnt") - col("cpos")) * col("r2")).as("w2_minus"),
        // same cnt³ promotion as mannWhitney: multiplicity cubes wrap
        // silently in plain Long past ~2.1M-row ties
        sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
          - col("cnt")).cast("long").as("tie_term"))
      .crossJoin(broadcast(zeros))
      .select(
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("n_zero"),
        coalesce(col("w2_plus"), lit(0L)).as("w2_plus"),
        coalesce(col("w2_minus"), lit(0L)).as("w2_minus"),
        when(col("w2_plus") + col("w2_minus") > 0L,
          halfUpDiv((col("w2_plus") - col("w2_minus")) * 1000000L,
            col("w2_plus") + col("w2_minus"))).as("rank_biserial_ppm"),
        coalesce(col("tie_term"), lit(0L)).as("tie_term"))
  }

  /** Oracle SQL twin of [[wilcoxonSigned]]. */
  def wilcoxonSignedOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH p AS (
       |  SELECT user_id, epoch_ms(ts) AS ms,
       |    CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'purchase'
       |), b AS (
       |  SELECT CAST((min(ms) + max(ms)) // 2 AS BIGINT) AS mid FROM p
       |), u AS (
       |  SELECT user_id,
       |    sum(CASE WHEN ms <= (SELECT mid FROM b) THEN c ELSE 0 END) AS s1,
       |    sum(CASE WHEN ms > (SELECT mid FROM b) THEN c ELSE 0 END) AS s2
       |  FROM p GROUP BY 1
       |), d0 AS (SELECT s2 - s1 AS d FROM u),
       |z AS (SELECT count(*) AS n_zero FROM d0 WHERE d = 0),
       |h AS (
       |  SELECT abs(d) AS ad, count(*) AS cnt,
       |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos
       |  FROM d0 WHERE d <> 0 GROUP BY 1
       |), r AS (
       |  SELECT cnt, cpos,
       |    CAST(sum(cnt) OVER (ORDER BY ad) * 2 - cnt + 1 AS BIGINT) AS r2
       |  FROM h
       |), m AS (
       |  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_pairs,
       |    CAST(coalesce(sum(cpos * r2), 0) AS BIGINT) AS w2_plus,
       |    CAST(coalesce(sum((cnt - cpos) * r2), 0) AS BIGINT) AS w2_minus,
       |    CAST(coalesce(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt), 0)
       |      AS BIGINT) AS tie_term
       |  FROM r
       |)
       |SELECT m.n_pairs, z.n_zero, m.w2_plus, m.w2_minus,
       |  CASE WHEN m.w2_plus + m.w2_minus > 0 THEN
       |    ${halfUpDivSql("(m.w2_plus - m.w2_minus) * 1000000",
                           "m.w2_plus + m.w2_minus")}
       |  END AS rank_biserial_ppm,
       |  m.tie_term
       |FROM m, z""".stripMargin
  }

  /** Single-changepoint LOCATOR on the hourly purchase-revenue series —
    * the CUSUM estimator: the split t maximizing |S₁(t)·n − n₁(t)·S|,
    * i.e. the hour where the cumulative sum deviates furthest from the
    * global trend line. This is binary segmentation's first cut with a
    * DIVISION-FREE objective (the usual between-segment variance
    * B(t) = (S₁n₂ − S₂n₁)²/(n·n₁·n₂) shares its argmax direction with
    * the CUSUM deviation, which stays exactly integral — no float or
    * rational comparison enters the argmax, so the located hour is
    * bit-deterministic cross-engine). Complements [[EventOps.cusumShifts]]
    * (Page's ALARM detector — "is there drift?"); this answers "WHERE
    * did the level shift?".
    *
    * Scale shape: the series is the hourly rollup — bounded by the
    * observed time range, not the event count — so the cumulative
    * window and the top-1 argmax run on a frame that is ~10³ rows at
    * every sf (a year is 8 760 hours). |S·n| ≤ 10¹⁸ holds to ~$10M of
    * total purchase cents × 10⁵ hours; the g_stat aggregate is
    * DECIMAL(38,0)/HUGEINT so the bound is the PER-ROW product, loud at
    * overflow under ANSI decimal, not silent.
    */
  def changepoint(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.ratio
    val hourly = events.where(col("event_type") === "purchase")
      .groupBy(expr("CAST(unix_millis(ts) DIV 3600000 AS BIGINT)").as("hr"))
      .agg(sum(cents("value")).as("c"))
    val w = Window.orderBy(col("hr"))
    val cum = hourly.select(col("hr"),
      row_number().over(w).cast("long").as("n1"),
      sum(col("c")).over(w).as("s1"))
    val tot = hourly.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val scored = cum.crossJoin(broadcast(tot))
      .where(col("n1") < col("n"))
      .select(col("hr"), col("n1"), (col("n") - col("n1")).as("n2"),
        col("s1"), (col("s") - col("s1")).as("s2"),
        abs(col("s1").cast("decimal(38,0)") * col("n")
          - col("n1").cast("decimal(38,0)") * col("s")).as("g"))
    scored
      .orderBy(col("g").desc, col("hr"))
      .limit(1)
      .select(col("hr").as("split_hr"), col("n1").as("n_left"),
        col("n2").as("n_right"), col("s1").as("sum_left_c"),
        col("s2").as("sum_right_c"),
        ratio(col("s1"), col("n1"), 2).as("mean_left_c"),
        ratio(col("s2"), col("n2"), 2).as("mean_right_c"),
        col("g").cast("decimal(38,0)").cast("string").as("g_stat"))
  }

  /** Oracle SQL twin of [[changepoint]]. */
  def changepointOracle: String = {
    import graft.functions.DetAgg.ratioSql
    s"""WITH hourly AS (
       |  SELECT CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hr,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1
       |), cum AS (
       |  SELECT hr,
       |    CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS n1,
       |    CAST(sum(c) OVER (ORDER BY hr) AS BIGINT) AS s1
       |  FROM hourly
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
       |  FROM hourly
       |), scored AS (
       |  SELECT hr, n1, n - n1 AS n2, s1, s - s1 AS s2,
       |    abs(CAST(s1 AS HUGEINT) * n - CAST(n1 AS HUGEINT) * s) AS g
       |  FROM cum, tot WHERE n1 < n
       |)
       |SELECT hr AS split_hr, n1 AS n_left, n2 AS n_right,
       |  s1 AS sum_left_c, s2 AS sum_right_c,
       |  ${ratioSql("s1", "n1", 2)} AS mean_left_c,
       |  ${ratioSql("s2", "n2", 2)} AS mean_right_c,
       |  CAST(g AS VARCHAR) AS g_stat
       |FROM scored ORDER BY g DESC, hr LIMIT 1""".stripMargin
  }

  /** Seasonal-naive forecast skill per event type (the MASE shape) —
    * the "is there exploitable daily seasonality?" eval every
    * forecasting pipeline runs before fitting anything: on the hourly
    * value series, compare the lag-24 seasonal-naive forecast's MAE
    * against the lag-1 naive MAE. `mase_ppm` < 1 000 000 means
    * yesterday-same-hour beats last-hour — the series has daily
    * structure worth modeling; ≥ 1e6 means it does not. Errors are
    * exact integer cents; the final scale-free ratio normalizes both
    * MAEs by their own pair counts (cross-multiplied in
    * DECIMAL(38,0)/HUGEINT, one rounding).
    *
    * Scale shape: the hourly rollup bounds everything by the observed
    * time range × |event types|; lags are hour-ARITHMETIC self-joins
    * on (type, hr−ℓ) — gap-correct where a row-number lag would slide
    * across missing hours — and the joins are hash joins on a
    * ~10³-row frame. No windows.
    */
  def seasonalMase(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.{halfUpDiv, ratio}
    val hourly = events
      .groupBy(col("event_type"),
        expr("CAST(unix_millis(ts) DIV 3600000 AS BIGINT)").as("hr"))
      .agg(sum(cents("value")).as("c"))
    def lagged(l: Int): DataFrame = hourly.select(col("event_type"),
      (col("hr") + l.toLong).as("hr"), col("c").as(s"c_lag$l"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    hourly
      .join(lagged(1), Seq("event_type", "hr"), "left")
      .join(lagged(24), Seq("event_type", "hr"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        count(col("c_lag1")).as("n1"),
        sum(abs(col("c") - col("c_lag1"))).as("s1"),
        count(col("c_lag24")).as("n24"),
        sum(abs(col("c") - col("c_lag24"))).as("s24"))
      .select(col("event_type"), col("n_hours"), col("n1"), col("n24"),
        when(col("n1") > 0L, ratio(col("s1"), col("n1"), 2)).as("mae1_c"),
        when(col("n24") > 0L, ratio(col("s24"), col("n24"), 2))
          .as("mae24_c"),
        when(col("n24") > 0L && col("s1") > 0L,
          halfUpDiv(dec(col("s24")) * col("n1") * 1000000L,
            dec(col("s1")) * col("n24"))).as("mase_ppm"))
      .orderBy("event_type")
  }

  /** Oracle SQL twin of [[seasonalMase]]. */
  def seasonalMaseOracle: String = {
    import graft.functions.DetAgg.{halfUpDivHugeSql, ratioSql}
    s"""WITH hourly AS (
       |  SELECT event_type, CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hr,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), j AS (
       |  SELECT h.event_type, h.c, l1.c AS c_lag1, l24.c AS c_lag24
       |  FROM hourly h
       |  LEFT JOIN hourly l1 ON l1.event_type = h.event_type
       |    AND l1.hr = h.hr - 1
       |  LEFT JOIN hourly l24 ON l24.event_type = h.event_type
       |    AND l24.hr = h.hr - 24
       |), m AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
       |    CAST(count(c_lag1) AS BIGINT) AS n1,
       |    CAST(coalesce(sum(abs(c - c_lag1)), 0) AS BIGINT) AS s1,
       |    CAST(count(c_lag24) AS BIGINT) AS n24,
       |    CAST(coalesce(sum(abs(c - c_lag24)), 0) AS BIGINT) AS s24
       |  FROM j GROUP BY 1
       |)
       |SELECT event_type, n_hours, n1, n24,
       |  CASE WHEN n1 > 0 THEN ${ratioSql("s1", "n1", 2)} END AS mae1_c,
       |  CASE WHEN n24 > 0 THEN ${ratioSql("s24", "n24", 2)} END AS mae24_c,
       |  CASE WHEN n24 > 0 AND s1 > 0 THEN
       |    ${halfUpDivHugeSql("CAST(s24 AS HUGEINT) * n1 * 1000000",
                               "CAST(s1 AS HUGEINT) * n24")}
       |  END AS mase_ppm
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** Difference-in-differences on purchase spend — the parallel-trends
    * causal estimator: arms by user parity (the q227/q255 convention),
    * periods split at the integer midpoint of the observed purchase
    * range (the [[wilcoxonSigned]] convention), and the estimate is
    * (B̄post − B̄pre) − (Āpost − Āpre): arm B's spend change net of the
    * secular trend arm A experienced. Each cell mean is an exact
    * half-up integer in centi-cent (c100) units, so the DiD is an
    * integer DIFFERENCE OF ROUNDED MEANS — deterministic cross-engine,
    * error ≤ 2 c100 from the four roundings.
    *
    * Scale shape: ONE conditional-aggregate row over the purchase scan
    * (8 sums, map-side combined) after a 1-row broadcast of the
    * midpoint — no joins between cells, no windows, nothing keyed
    * wider than the 4-cell rollup.
    */
  def diffInDiff(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val p = events.where(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        expr("unix_millis(ts)").as("ms"), cents("value").as("c"))
    val mid = p.agg(
      expr("CAST((min(ms) + max(ms)) DIV 2 AS BIGINT)").as("mid"))
    def cell(arm: Long, post: Boolean): (Column, Column) = {
      val in = col("arm") === arm &&
        (if (post) col("ms") > col("mid") else col("ms") <= col("mid"))
      (sum(when(in, 1L).otherwise(0L)), sum(when(in, col("c")).otherwise(0L)))
    }
    val (naPre, saPre) = cell(0L, post = false)
    val (naPost, saPost) = cell(0L, post = true)
    val (nbPre, sbPre) = cell(1L, post = false)
    val (nbPost, sbPost) = cell(1L, post = true)
    def m(s: Column, n: Column): Column =
      when(n > 0L, halfUpDiv(s * 100L, n))
    p.crossJoin(broadcast(mid))
      .agg(naPre.as("n_a_pre"), saPre.as("s_a_pre"),
        naPost.as("n_a_post"), saPost.as("s_a_post"),
        nbPre.as("n_b_pre"), sbPre.as("s_b_pre"),
        nbPost.as("n_b_post"), sbPost.as("s_b_post"))
      .select(col("n_a_pre"), col("n_a_post"), col("n_b_pre"),
        col("n_b_post"),
        m(col("s_a_pre"), col("n_a_pre")).as("mean_a_pre_c100"),
        m(col("s_a_post"), col("n_a_post")).as("mean_a_post_c100"),
        m(col("s_b_pre"), col("n_b_pre")).as("mean_b_pre_c100"),
        m(col("s_b_post"), col("n_b_post")).as("mean_b_post_c100"))
      .withColumn("did_c100",
        (col("mean_b_post_c100") - col("mean_b_pre_c100"))
          - (col("mean_a_post_c100") - col("mean_a_pre_c100")))
  }

  /** Oracle SQL twin of [[diffInDiff]]. */
  def diffInDiffOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    def cellN(arm: Int, post: Boolean) = {
      val per = if (post) "ms > (SELECT mid FROM b)"
        else "ms <= (SELECT mid FROM b)"
      s"CAST(sum(CASE WHEN arm = $arm AND $per THEN 1 ELSE 0 END) AS BIGINT)"
    }
    def cellS(arm: Int, post: Boolean) = {
      val per = if (post) "ms > (SELECT mid FROM b)"
        else "ms <= (SELECT mid FROM b)"
      s"CAST(sum(CASE WHEN arm = $arm AND $per THEN c ELSE 0 END) AS BIGINT)"
    }
    def guard(n: String, e: String) = s"CASE WHEN $n > 0 THEN $e END"
    s"""WITH p AS (
       |  SELECT user_id % 2 AS arm, epoch_ms(ts) AS ms,
       |    CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'purchase'
       |), b AS (
       |  SELECT CAST((min(ms) + max(ms)) // 2 AS BIGINT) AS mid FROM p
       |), w AS (
       |  SELECT
       |    ${cellN(0, post = false)} AS n_a_pre,
       |    ${cellS(0, post = false)} AS s_a_pre,
       |    ${cellN(0, post = true)} AS n_a_post,
       |    ${cellS(0, post = true)} AS s_a_post,
       |    ${cellN(1, post = false)} AS n_b_pre,
       |    ${cellS(1, post = false)} AS s_b_pre,
       |    ${cellN(1, post = true)} AS n_b_post,
       |    ${cellS(1, post = true)} AS s_b_post
       |  FROM p
       |), mm AS (
       |  SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
       |    ${guard("n_a_pre", halfUpDivSql("s_a_pre * 100", "n_a_pre"))}
       |      AS mean_a_pre_c100,
       |    ${guard("n_a_post", halfUpDivSql("s_a_post * 100", "n_a_post"))}
       |      AS mean_a_post_c100,
       |    ${guard("n_b_pre", halfUpDivSql("s_b_pre * 100", "n_b_pre"))}
       |      AS mean_b_pre_c100,
       |    ${guard("n_b_post", halfUpDivSql("s_b_post * 100", "n_b_post"))}
       |      AS mean_b_post_c100
       |  FROM w
       |)
       |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
       |  mean_a_pre_c100, mean_a_post_c100, mean_b_pre_c100,
       |  mean_b_post_c100,
       |  (mean_b_post_c100 - mean_b_pre_c100)
       |    - (mean_a_post_c100 - mean_a_pre_c100) AS did_c100
       |FROM mm""".stripMargin
  }

  /** Cochran–Armitage trend test over ordered exposure tiers — "does
    * the same-day purchase rate TREND with browsing intensity?", the
    * dose-response question a χ² independence test (q152) cannot
    * answer because it ignores tier ORDER. Unit = (user, day); exposure
    * score s = same-day view+click count capped at 4 (integer scores
    * 0..4, the standard equally-spaced choice); response = purchased
    * that day.
    *
    * Reported exactly: the per-tier moment sums (Σs·n, Σs²·n, Σs·a —
    * all linear in units, BIGINT-safe to ~2·10¹⁴ user-days), the trend
    * direction sign(T) where T = N·Σs·a − A·Σs·n, and the standard
    * CA statistic Z² = N·T² / (A·(N−A)·(N·Σs²n − (Σsn)²)) in ppm, with
    * every product promoted to DECIMAL(38,0)/HUGEINT BEFORE
    * multiplying (T² alone squares a ~N·A-sized integer). No libm:
    * Z² is a ratio of exact integers, half-up divided.
    *
    * Scale shape: one map-side-combined groupBy to (user, day) cells,
    * a 5-row tier histogram, then a 1-row rollup — the shuffled frame
    * after the first aggregate is O(active user-days), and nothing
    * downstream exceeds 5 rows. At ~10¹⁹ user-days T² would pass
    * DECIMAL(38,0); the ppm readout (not raw T) is the output contract
    * precisely so that a future int256 rescale stays internal.
    */
  def propTrend(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val ud = events.groupBy(col("user_id"),
        expr("unix_millis(ts) DIV 86400000").as("d"))
      .agg(sum(when(col("event_type").isin("view", "click"), 1L)
          .otherwise(0L)).as("act"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
    val g = ud.select(least(col("act"), lit(4L)).as("s"), col("c"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("a"))
    val m = g.agg(
      sum(col("n")).as("nn"), sum(col("a")).as("aa"),
      sum(col("s") * col("n")).as("sn"),
      sum(col("s") * col("s") * col("n")).as("s2n"),
      sum(col("s") * col("a")).as("sa"))
    val t = dec(col("nn")) * dec(col("sa")) - dec(col("aa")) * dec(col("sn"))
    val v = dec(col("aa")) * dec(col("nn") - col("aa")) *
      (dec(col("nn")) * dec(col("s2n")) - dec(col("sn")) * dec(col("sn")))
    m.select(col("nn").as("n_units"), col("aa").as("n_resp"),
      col("sn").as("sum_sn"), col("s2n").as("sum_s2n"),
      col("sa").as("sum_sa"),
      when(t > 0, 1L).when(t < 0, -1L).otherwise(0L).as("trend_sign"),
      when(v > 0, halfUpDiv(dec(col("nn")) * t * t * lit(1000000L), v))
        .as("z2_ppm"))
  }

  /** Oracle SQL twin of [[propTrend]] — identical tiering and HUGEINT
    * moment promotion. */
  def propTrendOracle: String = {
    import graft.functions.DetAgg.halfUpDivHugeSql
    val t = "(CAST(nn AS HUGEINT) * sa - CAST(aa AS HUGEINT) * sn)"
    val v = "(CAST(aa AS HUGEINT) * (nn - aa) * " +
      "(CAST(nn AS HUGEINT) * s2n - CAST(sn AS HUGEINT) * sn))"
    s"""WITH ud AS (
       |  SELECT user_id, epoch_ms(ts) // 86400000 AS d,
       |    sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0
       |      END) AS act,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
       |  FROM events GROUP BY 1, 2
       |), g AS (
       |  SELECT least(act, 4) AS s, count(*) AS n, sum(c) AS a
       |  FROM ud GROUP BY 1
       |), m AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(a) AS BIGINT) AS aa,
       |    CAST(sum(s * n) AS BIGINT) AS sn,
       |    CAST(sum(s * s * n) AS BIGINT) AS s2n,
       |    CAST(sum(s * a) AS BIGINT) AS sa
       |  FROM g
       |)
       |SELECT nn AS n_units, aa AS n_resp, sn AS sum_sn, s2n AS sum_s2n,
       |  sa AS sum_sa,
       |  CASE WHEN $t > 0 THEN 1 WHEN $t < 0 THEN -1 ELSE 0
       |    END AS trend_sign,
       |  CASE WHEN $v > 0 THEN
       |    ${halfUpDivHugeSql(s"CAST(nn AS HUGEINT) * $t * $t * 1000000",
                               v)}
       |  END AS z2_ppm
       |FROM m""".stripMargin
  }

  /** q295: Wald–Wolfowitz runs test per event type — is the sign of
    * (value − median) serially random along the event stream, or do
    * high/low values clump? The nonparametric autocorrelation screen
    * that complements [[EventOps.hourlyAcf]] (linear, binned by hour)
    * with an order-only statistic on the raw sequence: far fewer runs
    * than expected ⇒ regime persistence (sessions of big spenders,
    * cache effects), far more ⇒ alternation (load-balancer
    * round-robin artifacts). Values equal to the median drop (the
    * standard convention; their count is implicit in n_pos+n_neg vs
    * the group size). Reported: observed runs and the expected-runs
    * mean 1 + 2n₁n₂/n in ppm — raw integers, no libm, consumers
    * bring their own normal cut (the repo's no-p-value stance).
    *
    * Scale shape: the median comes from the per-type VALUE HISTOGRAM
    * (|distinct cents| rows, the q169 stance); the run count is one
    * lag over the per-type (ts, event_id) sort — a single Exchange +
    * Sort keyed by event type; 2n₁n₂ promotes to DECIMAL(38,0)/
    * HUGEINT before the ppm division.
    */
  def runsTest(events: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    def dec(c: Column) = c.cast("decimal(38,0)")
    val base = events.select(col("event_type").as("et"),
      expr("unix_millis(ts)").as("ms"), col("event_id"),
      cents("value").as("c"))
    val h = base.groupBy(col("et"), col("c")).agg(count(lit(1)).as("cnt"))
    val cum = h.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("et")).orderBy(col("c"))))
    val tot = h.groupBy(col("et")).agg(sum(col("cnt")).as("n"))
    val med = cum.join(tot, Seq("et"))
      .where(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy(col("et")).agg(min(col("c")).as("med"))
    val w = Window.partitionBy(col("et")).orderBy(col("ms"), col("event_id"))
    val signed = base.join(med, Seq("et"))
      .where(col("c") =!= col("med"))
      .select(col("et"), col("ms"), col("event_id"),
        when(col("c") > col("med"), 1L).otherwise(0L).as("s"))
    val runs = signed
      .withColumn("chg",
        when(lag(col("s"), 1).over(w).isNull, 1L)
          .when(lag(col("s"), 1).over(w) =!= col("s"), 1L)
          .otherwise(0L))
      .groupBy(col("et"))
      .agg(sum(col("s")).as("n_pos"),
        sum(lit(1L) - col("s")).as("n_neg"),
        sum(col("chg")).as("n_runs"))
    runs.select(col("et").as("event_type"),
        col("n_pos"), col("n_neg"), col("n_runs"),
        (lit(1000000L) + halfUpDiv(
          dec(col("n_pos")) * col("n_neg") * 2L * 1000000L,
          dec(col("n_pos") + col("n_neg")))).as("expected_runs_ppm"))
      .orderBy("event_type")
  }

  /** Oracle SQL twin of [[runsTest]]. */
  def runsTestOracle: String = {
    import graft.functions.DetAgg.halfUpDivHugeSql
    s"""WITH b AS (
       |  SELECT event_type AS et, epoch_ms(ts) AS ms, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events
       |), h AS (
       |  SELECT et, c, CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1, 2
       |), cm AS (
       |  SELECT et, c,
       |    CAST(sum(cnt) OVER (PARTITION BY et ORDER BY c) AS BIGINT) AS cum
       |  FROM h
       |), tt AS (SELECT et, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
       |md AS (
       |  SELECT cm.et, min(cm.c) AS med
       |  FROM cm JOIN tt ON tt.et = cm.et
       |  WHERE cm.cum >= (tt.n + 1) // 2
       |  GROUP BY 1
       |), sg AS (
       |  SELECT b.et, b.ms, b.event_id,
       |    CASE WHEN b.c > md.med THEN 1 ELSE 0 END AS s
       |  FROM b JOIN md ON md.et = b.et
       |  WHERE b.c <> md.med
       |), ch AS (
       |  SELECT et, s,
       |    CASE WHEN lag(s) OVER (PARTITION BY et ORDER BY ms, event_id)
       |      IS NULL THEN 1
       |      WHEN lag(s) OVER (PARTITION BY et ORDER BY ms, event_id) <> s
       |      THEN 1 ELSE 0 END AS chg
       |  FROM sg
       |), g AS (
       |  SELECT et, CAST(sum(s) AS BIGINT) AS n_pos,
       |    CAST(sum(1 - s) AS BIGINT) AS n_neg,
       |    CAST(sum(chg) AS BIGINT) AS n_runs
       |  FROM ch GROUP BY 1
       |)
       |SELECT et AS event_type, n_pos, n_neg, n_runs,
       |  1000000 + ${halfUpDivHugeSql(
            "CAST(n_pos AS HUGEINT) * n_neg * 2 * 1000000", "n_pos + n_neg")}
       |    AS expected_runs_ppm
       |FROM g ORDER BY event_type""".stripMargin
  }
}
