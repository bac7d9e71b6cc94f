package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: as-of join and built-in session windows.
  *
  * The reference's enrichment join J1 (`TrafficStreamProcessor.scala:52-56`)
  * is "join each event with the LATEST attach row for its bearer" — a
  * point-in-time lookup that generalizes to the as-of join every temporal
  * pipeline needs (latest quote per trade, latest config per event, …).
  * [[asOfJoin]] is that operator in full generality; q04_latest_per_key
  * covers the degenerate "as of +∞" case.
  */
object TemporalOps {

  /** As-of join: for every left row, attach the payload of the most
    * recent right row with the same key and `right.tsCol <= left.tsCol`
    * (a right row at exactly the left timestamp matches).
    *
    * Scale design: the naive formulation is an inequality join — O(L·R)
    * per key under a nested-loop or a planner range join. This instead
    * UNIONs the two sides and takes one running `last(_, ignoreNulls)`
    * window pass: a single shuffle on the key, one linear scan per
    * partition, no join at all. At 100 TB the cost is one exchange of
    * L+R rows; a skewed key is the only hazard (pre-split such keys by
    * time range if one dominates).
    *
    * `left` keeps all its columns; each right payload column `c` comes
    * back as `asof_c`, null when no right row precedes. Right rows must
    * be unique per (keys, tsCol) — pre-aggregate the right side,
    * otherwise the winner among same-timestamp rows is tie-ambiguous.
    *
    * The payload columns travel as ONE struct and the running fill is a
    * single `last(struct, ignoreNulls)` — every `asof_*` value comes
    * from the SAME matched right row, and a NULL payload value in that
    * row stays NULL (filling columns independently would backfill each
    * one from a possibly different, older right row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right
      .select(keys.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(0).as("__is_l"),
          struct(payload.map(col): _*).as("__pay")): _*)
    val l = left
      .withColumn("__row", struct(leftCols.map(col): _*))
      .select(keys.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(1).as("__is_l"), col("__row"),
          lit(null).cast(r.schema("__pay").dataType).as("__pay")): _*)
    val r2 = r.withColumn("__row",
      lit(null).cast(l.schema("__row").dataType))
    // Right sorts before left at equal __ts (0 < 1), so a same-instant
    // right row is visible to the left row — the ASOF `>=` convention.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r2)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__is_l") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Bucketized range join — point-in-interval, the inequality join
    * Spark has no native operator for, composed from equi-join
    * machinery: intervals explode to the time buckets they cover,
    * points key by their bucket, the bucket equi-join prunes the
    * candidate space, and the exact `start ≤ pt < end` predicate
    * filters in-task. A naive inequality join plans as a broadcast
    * nested loop (O(|points|·|intervals|) comparisons); here the
    * comparison count is Σ_bucket |points_b|·|intervals_b| — linear in
    * the data for any bucket width near the typical interval length.
    *
    * Scale notes: pick `bucketMs` ≈ median interval length (an
    * interval explodes to len/bucket+1 rows; a too-small bucket
    * multiplies the interval side, a too-large one stops pruning). A
    * hot bucket (many concurrent intervals) is ordinary join skew —
    * [[ScaleOps.saltedJoin]] composes on top of the bucket key.
    * Empty/negative intervals are dropped (sequence() would run
    * BACKWARDS for end < start, fabricating buckets). Optional `keys`
    * (probe-col → interval-col pairs) join equi-keys alongside the
    * bucket — the keyed (per-stream) interval join, where pruning is
    * (key, bucket)-selective. A loud `maxBuckets` guard rejects
    * intervals that would fan out absurdly instead of silently
    * exploding them.
    */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketMs: Long, keys: Seq[(String, String)] = Nil,
                maxBuckets: Long = 1000L): DataFrame = {
    require(bucketMs >= 1L, s"bucketMs must be >= 1, got $bucketMs")
    val b0 = expr(s"$startCol DIV $bucketMs")
    val b1 = expr(s"($endCol - 1) DIV $bucketMs")
    // LOUD width guard (same stance as locfResample's span guard): an
    // interval fanning out past maxBuckets means corrupt bounds or a
    // mis-sized bucket, not a bigger explode.
    val b1Checked = when(b1 - b0 >= maxBuckets,
      raise_error(format_string(
        s"rangeJoin: interval [%s, %s) spans %s buckets (limit $maxBuckets)",
        col(startCol), col(endCol), b1 - b0 + 1)).cast("long"))
      .otherwise(b1)
    val ivals = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(b0, b1Checked)))
    val pts = points.withColumn("__b", expr(s"$ptCol DIV $bucketMs"))
    pts.join(ivals, pts("__b") === ivals("__b") &&
        keys.map { case (pk, ik) => pts(pk) === ivals(ik) }
          .foldLeft(lit(true))(_ && _))
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__b")
  }

  /** Range-join demo query: how many events (ANY user's) fall inside
    * each user session's time interval — cross-user concurrency per
    * session. Sessions come from [[sessionWindowAgg]]; the overlap
    * count is ≥ the session's own n_events by construction.
    */
  def sessionOverlap(events: DataFrame, gap: String = "30 minutes",
                     bucketMs: Long = 1800000L): DataFrame = {
    val sessions = sessionWindowAgg(events, gap, sorted = false)
      .select(col("user_id"), col("start_ms"), col("end_ms"))
    val pts = events.select(unix_millis(col("ts")).as("ms"))
    rangeJoin(pts, "ms", sessions, "start_ms", "end_ms", bucketMs)
      .groupBy(col("user_id"), col("start_ms"), col("end_ms"))
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("user_id", "start_ms")
  }

  /** Oracle SQL twin of [[sessionOverlap]] — the shared sessionize CTEs
    * ([[graft.operators.EventOps.sessionCtesSql]]), then a plain
    * inequality join (DuckDB's IEJoin does the pruning the bucketized
    * plan does by hand).
    */
  def sessionOverlapOracle(gapMs: Long = 1800000L): String =
    s"""WITH ${EventOps.sessionCtesSql(gapMs)}, s AS (
       |  SELECT user_id, min(ms) AS start_ms, max(ms) + $gapMs AS end_ms
       |  FROM y GROUP BY user_id, sid
       |), e AS (SELECT epoch_ms(ts) AS ms FROM events)
       |SELECT s.user_id, s.start_ms, s.end_ms, count(*) AS n_overlap
       |FROM s JOIN e ON e.ms >= s.start_ms AND e.ms < s.end_ms
       |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  /** Event-time gap sessions via the built-in `session_window` — the
    * operator form of q14's manual lag+cumsum sessionization, and the
    * one that runs unchanged under Structured Streaming (watermark +
    * merging session state; StreamingSpec drives it through
    * MemoryStream). Window end = last event + gap, half-open: an event
    * exactly `gap` after the previous one MERGES into the same session —
    * a new session requires a gap strictly greater than `gap` (verified
    * in ScaleAndTemporalSpec, and matched by the q45 oracle).
    *
    * `sorted = false` skips the presentation ORDER BY — required for
    * streaming append mode, where a global sort is unsupported (the
    * batch/oracle path keeps the stable total order).
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       sorted: Boolean = true): DataFrame = {
    val agg = events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("sum_value"))
    if (sorted) agg.orderBy("user_id", "start_ms") else agg
  }
}
