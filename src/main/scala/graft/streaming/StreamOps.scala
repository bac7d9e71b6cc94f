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

  /** Streaming decontamination — the streaming form of
    * [[graft.operators.DedupOp.decontaminate]] for ingest-time
    * filtering: the eval set is a STATIC frame (benchmarks change at
    * release cadence, not stream cadence), its distinct w-grams are
    * broadcast, and each arriving doc's grams probe it in a
    * stream-static inner join — STATELESS, the cheapest legal shape
    * (a per-doc hit COUNT would be a streaming aggregate burning a
    * stateful-operator slot; like [[streamingNearDup]]'s pair stream,
    * the hit stream is treated as a set by its sink). Emits one
    * (doc_id, sh) row per contaminated gram occurrence.
    */
  def streamingDecontaminate(stream: DataFrame, evalDocs: DataFrame,
                             w: Int = 5): DataFrame = {
    import graft.operators.DedupOp
    // same gram pipeline as the batch operator — ONE definition of the
    // exact-strings decision (DedupOp.docGrams), asserted equal in
    // StreamingSpec
    val evalSh = DedupOp.evalGramSet(evalDocs, w)
    DedupOp.docGrams(stream, w).join(broadcast(evalSh), Seq("sh"))
      .select(col("doc_id"), col("sh"))
  }

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
  /** One (doc, band) row of the streaming near-dup path: `bandSig` is
    * the band's [[graft.operators.DedupOp.BandRows]] minhash values
    * joined as the bucket key; `sig` is the full signature for
    * verification.
    */
  case class BandedDoc(docId: Long, ts: java.sql.Timestamp, band: Int,
                       bandSig: String, sig: Seq[Long])

  /** LSH bucket state: every (docId, signature) currently live in this
    * (band, bandSig) bucket.
    */
  case class BucketState(docs: Seq[(Long, Seq[Long])])

  /** A verified near-dup hit. The same pair CAN surface from more than
    * one band (each bucket is blind to the others — deduplicating
    * across bands would need a second stateful operator); downstream
    * consumers treat the pair stream as a set, exactly like the batch
    * path's `.distinct()`.
    */
  case class NearDupHit(da: Long, db: Long, band: Int, est_jaccard: Double)

  /** Streaming MinHash near-dup detection — the streaming form of
    * [[graft.operators.DedupOp.minhashLsh]]: signatures are computed
    * ROW-LOCALLY ([[graft.operators.DedupOp.minhashSignatureArray]] —
    * stateless, so the query's single stateful operator is the bucket
    * matcher), docs land in (band, bandSig) buckets via
    * `flatMapGroupsWithState`, and each arrival is verified (signature
    * agreement ≥ `minSim`) against the docs its bucket has seen.
    *
    * State = live docs per bucket, evicted `horizon` past each
    * bucket's latest event time (event-time timeout against the
    * watermark) — memory is arrival-rate × horizon, not corpus size,
    * the same bounded-state stance as [[streamingDedup]]; global
    * history belongs to the batch compaction.
    */
  def streamingNearDup(docs: DataFrame, minSim: Double = 0.5,
                       tsCol: String = "ts",
                       watermark: String = "10 minutes",
                       horizonMs: Long = 600000L): Dataset[NearDupHit] = {
    import graft.operators.DedupOp
    import org.apache.spark.sql.streaming.{GroupState, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val nBands = DedupOp.NumPerms / DedupOp.BandRows
    // .as[BandedDoc], never .map: a typed map re-encodes the rows and
    // drops the event-time watermark attribute the timeout needs
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col("doc_id").as("docId"), col(tsCol).as("ts"),
        DedupOp.minhashSignatureArray(col("text")).as("sig"))
      .where(element_at(col("sig"), 1).isNotNull) // drop shingle-less docs
      .select(col("docId"), col("ts"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bandSig", array_join(transform(
        slice(col("sig"), (col("band") * DedupOp.BandRows + 1).cast("int"),
          lit(DedupOp.BandRows)), v => v.cast("string")), ","))
      .select(col("docId"), col("ts"), col("band"), col("bandSig"), col("sig"))
      .as[BandedDoc]
    def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }
        .toDouble / DedupOp.NumPerms
    val matcher = (key: (Int, String), arrivals: Iterator[BandedDoc],
                   state: GroupState[BucketState]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty[NearDupHit]
      } else {
        // deterministic within-batch order: event time, then id
        val incoming = arrivals.toSeq.sortBy(d => (d.ts.getTime, d.docId))
        var live = state.getOption.map(_.docs).getOrElse(Seq.empty)
        val hits = Seq.newBuilder[NearDupHit]
        incoming.foreach { d =>
          live.foreach { case (oid, osig) =>
            if (oid != d.docId) {
              val est = estJaccard(osig, d.sig)
              if (est >= minSim)
                hits += NearDupHit(math.min(oid, d.docId),
                  math.max(oid, d.docId), key._1, est)
            }
          }
          live = live :+ (d.docId -> d.sig)
        }
        state.update(BucketState(live))
        val maxTs = incoming.map(_.ts.getTime).max
        state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs() + 1L, maxTs + horizonMs))
        hits.result().iterator
      }
    banded
      .groupByKey(d => (d.band, d.bandSig))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(matcher)
  }

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
