package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators beyond the windowed stats: JSON payload
  * extraction (reference S3/F2 — the rebuild's `from_json` analog of
  * play-json decode, `TrafficStreamProcessor.scala:37-39`) and gap-based
  * sessionization (the batch analog of `session_window`, SURVEY.md §2.6).
  */
object EventOps {

  /** Parse the JSON `props` payload and aggregate an extracted field.
    * `get_json_object` runs inside codegen; invalid JSON yields null and
    * is dropped — the same silent-drop semantics as the reference's
    * `flatMap(_.asOpt[T])` (`TrafficStreamProcessor.scala:39,49`).
    */
  def propsK(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.functions.DetAgg.avgInt(col("k")).as("avg_k"),
           sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** Pivot: day × event_type matrix of mean values. Pivot values are
    * declared explicitly so the output schema is static (required for
    * both determinism and sane plans — an unlisted pivot needs an extra
    * distinct-values job).
    */
  def dailyTypePivot(events: DataFrame): DataFrame =
    events
      .withColumn("__ms", unix_millis(col("ts")))
      .groupBy((expr("__ms DIV 86400000") * 86400000L).as("day_ms"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(graft.functions.DetAgg.avgCents2(col("value")))
      .orderBy("day_ms")

  /** Set op: users having BOTH purchase and error events (intersect). */
  def purchaseAndErrorUsers(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase").select(col("user_id"))
      .intersect(
        events.where(col("event_type") === "error").select(col("user_id")))
      .orderBy("user_id")

  /** Unpivot (melt): wide per-bucket stats back to long (stat, value)
    * rows — the inverse of the stats aggregate's wide shape.
    */
  def statsUnpivot(stats: DataFrame): DataFrame =
    stats.unpivot(
      Array(col("bucket_ms"), col("event_type")),
      Array(col("avg_value"), col("std_value"), col("min_value"),
        col("max_value")),
      "stat", "value")
      .orderBy("bucket_ms", "event_type", "stat")

  /** Gap-based sessionization per user: a new session starts when the
    * gap from the previous event exceeds `gapMs`. Classic lag + running
    * sum — one shuffle on user_id, then two pipelined window passes over
    * the same partitioning (Spark reuses the exchange).
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession =
      when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byUser))
             > gapMs, 1).otherwise(0)
    events
      .withColumn("new_s", coalesce(newSession, lit(0)))
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(unix_millis(col("ts"))).as("start_ms"),
           max(unix_millis(col("ts"))).as("end_ms"),
           round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id", "session_id")
  }
}
