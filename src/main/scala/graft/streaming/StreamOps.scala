package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.model.AttachEvent

/** Structured Streaming forms of the reference pipelines (SURVEY.md
  * §2.6/§3). Every transform here accepts batch OR streaming frames —
  * the plan is identical; only the sink differs. Event-time windows with
  * watermarks replace the reference's arrival-time DStream windows
  * (strictly more capable: deterministic under replay and late data).
  */
object StreamOps {

  /** Use case 1 (A1/W2): sliding-window per-key multi-metric stats over
    * a `metrics: map<string,double>` column. The map is exploded so the
    * whole aggregate is built-ins — one partial+final HashAggregate per
    * micro-batch, state bounded by (keys × metrics × open windows).
    * Emits per (window, key..., metric): count, mean, population stdev,
    * max, min — the reference's StatCounter surface
    * (`traffic/model/MetricStats.scala:16-23`).
    */
  def metricStats(events: DataFrame, keyCols: Seq[String],
                  windowSize: String = "30 seconds",
                  slide: String = "2 seconds",
                  watermark: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select((keyCols.map(col) :+ col("ts") :+
        explode(col("metrics")).as(Seq("metric", "value"))): _*)
      .groupBy(window(col("ts"), windowSize, slide) +: keyCols.map(col) :+
        col("metric"): _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col("value")).as("mean"),
        stddev_pop(col("value")).as("stdev"),
        max(col("value")).as("max"),
        min(col("value")).as("min"))

  /** The keyed upsert store (W5/S4): latest attach event per bearerId —
    * last-write-wins, emulating the reference's Cassandra
    * `PRIMARY KEY (bearer_id)` table. Batch form; in streaming this runs
    * inside `foreachBatch` against the accumulating store.
    */
  def latestByKey(df: DataFrame, key: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** W5, pure-streaming form: the latest attach per bearer held in
    * Spark-managed keyed state (`mapGroupsWithState`) instead of an
    * external store — emits the updated latest row per key per batch
    * (update mode). State is one row per bearer: bounded by key
    * cardinality, partitioned by the state store, no external system.
    */
  def latestAttachStateful(attach: Dataset[AttachEvent]): Dataset[AttachEvent] = {
    import attach.sparkSession.implicits._
    attach.groupByKey(_.bearerId)
      .mapGroupsWithState[AttachEvent, AttachEvent](GroupStateTimeout.NoTimeout) {
        (_, events, state) =>
          val latest = (state.getOption.iterator ++ events).maxBy(_.ts)
          state.update(latest)
          latest
      }
  }

  /** Use case prefix (J1): enrichment stream-static inner join on
    * bearerId — unmatched events drop, exactly the reference's
    * `joinWithCassandraTable` semantics. The static side is re-read (or
    * re-deduped) per micro-batch; Spark broadcasts it when small.
    */
  def enrich(celltowerEvents: DataFrame, attachLatest: DataFrame): DataFrame =
    celltowerEvents.join(attachLatest, Seq("bearerId"), "inner")

  /** Use case 2: geofence stream — the batch operator applied per
    * micro-batch; fences are tiny and broadcast. Accepts any frame with
    * (id, lat, lng).
    */
  def geofence(points: DataFrame): DataFrame =
    graft.operators.GeofenceOp.geofence(points)

  /** Streaming exact dedup — the ingest-time form of
    * [[graft.operators.DedupOp.exact]]: drop any record whose dedup key
    * (e.g. a content hash) was already seen. State is Spark-managed and
    * WATERMARK-BOUNDED (`dropDuplicatesWithinWatermark`): a key is
    * remembered only within the lateness horizon, so state size is
    * (arrival rate × horizon), not corpus size — the standard tradeoff
    * for unbounded streams. Exact global dedup over the full history
    * belongs to the batch operator; this catches the overwhelmingly
    * common near-in-time duplicates (retries, re-sends, crawler
    * re-fetches) with bounded memory at any scale.
    */
  def streamingDedup(df: DataFrame, keyCols: Seq[String],
                     tsCol: String = "ts",
                     watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming ingest-side corpus cleaning — the STREAMING PREFIX of
    * [[graft.operators.DedupOp.cleanCorpus]]: content-hash exact dedup
    * with watermark-bounded state, then the same pure-integer quality
    * predicates (token count ≥ `minTokens`, `2·uniq ≥ n`), row-local on
    * the stream. Near-dup survivor selection deliberately stays a BATCH
    * compaction over the landed corpus (its pair graph needs global
    * blocking state no stream should hold) — exactly how production
    * ingest splits the pipeline. Output adds `n_tokens`/`n_uniq` so the
    * sink can account token yield per batch.
    */
  def streamingCleanDocs(docs: DataFrame, minTokens: Int = 30,
                         tsCol: String = "ts",
                         watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val toks = tokens(col("text"))
    streamingDedup(docs.withColumn("__h", md5(col("text"))), Seq("__h"),
      tsCol, watermark)
      .drop("__h")
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_uniq", size(array_distinct(toks)).cast("long"))
      .where(col("n_tokens") >= minTokens &&
        col("n_uniq") * 2L >= col("n_tokens"))
  }
}
