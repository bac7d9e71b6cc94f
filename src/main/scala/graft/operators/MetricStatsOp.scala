package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed per-key multi-metric statistics (reference use case 1:
  * network congestion monitoring).
  *
  * Semantics from the reference's StatCounter-based aggregate
  * (`traffic/model/MetricStats.scala:5-34`,
  * `traffic/process/MetricStatsProducer.scala:19-25,41-47`): per key and
  * time window emit `count, mean, stdev(POPULATION), max, min`. The
  * reference runs it twice — keyed by subscriber and by celltower — so
  * the key column is a parameter.
  *
  * Rebuilt as built-in aggregates over an event-time `window()` so
  * Catalyst plans a single partial+final HashAggregate (map-side combine
  * before the shuffle — one exchange total, pre-aggregated). No custom
  * UDAF is needed; at 100 TB the partial aggregation bounds shuffle
  * volume by (keys × windows), not by input rows.
  */
object MetricStatsOp {

  private def agg(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                  keyCol: String): DataFrame =
    grouped
      .agg(
        count(lit(1)).as("n"),
        // exact-cents mean: see graft.functions.DetAgg (plain rounded avg
        // of 2-decimal data is a cross-engine coin flip at boundaries)
        graft.functions.DetAgg.avgCents2(col("value")).as("avg_value"),
        round(stddev_pop(col("value")), 4).as("std_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        unix_millis(col("w.start")).as("bucket_ms"),
        col(keyCol), col("n"), col("avg_value"), col("std_value"),
        col("min_value"), col("max_value"))
      .orderBy("bucket_ms", keyCol)

  /** Tumbling event-time window stats. Output bucket is epoch-millis of
    * the window start (engine-portable vs raw timestamps).
    */
  def tumbling(events: DataFrame, size: String = "30 seconds",
               keyCol: String = "event_type"): DataFrame =
    agg(events.groupBy(window(col("ts"), size).as("w"), col(keyCol)), keyCol)

  /** Sliding event-time window stats (the reference's 30 s / 2 s shape,
    * here parameterized). Spark assigns each event to size/slide
    * overlapping windows, all aligned to the epoch — the same row
    * multiplication a `reduceByKeyAndWindow` would do, but computed by
    * one hash aggregate.
    */
  def sliding(events: DataFrame, size: String = "30 seconds",
              slide: String = "10 seconds",
              keyCol: String = "event_type"): DataFrame =
    agg(events.groupBy(window(col("ts"), size, slide).as("w"), col(keyCol)),
      keyCol)
}
