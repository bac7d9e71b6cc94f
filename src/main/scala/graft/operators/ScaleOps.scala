package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Skew and sampling machinery for the 100 TB path.
  *
  * At cluster scale the failure mode of `groupBy`/`join` is not wrongness
  * but a single straggler reducer holding a hot key. These operators make
  * the mitigation explicit and testable: two-phase salted aggregation,
  * replicate-salt joins, and deterministic hash sampling (the
  * training-data-pipeline staple — `rand()` samples are not reproducible
  * across runs, engines, or cluster sizes; a content-hash sample is).
  */
object ScaleOps {

  /** THE per-document identity hash for every sampling / splitting /
    * ordering operator here, with its SQL twin below — one definition,
    * mirrored once, so the Spark and DuckDB sides can never drift
    * independently. The doc_id renders REVERSED before hashing:
    * [[graft.functions.PortableHashExpr]] folds only the first 8
    * chars + length, so un-reversed consecutive ids (one crawl chunk —
    * same prefix, same length at 9+ digits) would collide wholesale
    * and co-assign whole id-blocks to one split/sample, exactly the
    * correlated leakage a content-hash split exists to prevent.
    * Reversing puts the fastest-varying digits first.
    */
  private[graft] def docHash: Column =
    TextFunctions.portableHash(concat(
      reverse(col("doc_id").cast("string")), lit("|"), col("source")))

  /** SQL twin of [[docHash]]. */
  private[operators] def docHashSql: String =
    TextFunctions.portableHashSql(
      "concat(reverse(CAST(doc_id AS VARCHAR)), '|', source)")

  /** Two-phase (salted) aggregation for low-cardinality or skewed group
    * keys: phase 1 pre-aggregates on (key, salt) so each hot key spreads
    * over `salts` reducers; phase 2 merges the partials. Result is
    * identical to the direct groupBy — the sums are kept in exact integer
    * cents, so not even the float fold order changes.
    *
    * lineitem's `l_returnflag` has 3 distinct values — the degenerate
    * skew case where a direct groupBy funnels 600 k rows (60 B at 100 TB)
    * into 3 reducers after the partial-agg stage.
    */
  def saltedPricingSummary(lineitem: DataFrame, salts: Int = 32): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"),
        pmod(col("l_orderkey"), lit(salts.toLong)).as("__salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("l_quantity")).as("pqty"),
           sum(round(col("l_extendedprice") * 100).cast("long")).as("pcents"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).as("n"),
           sum(col("pqty")).as("sum_qty"),
           (sum(col("pcents")).cast("double") / 100.0).as("sum_price"))
      .orderBy("l_returnflag")

  /** Replicate-salt equi-join for a skewed join key: the big side gets a
    * deterministic salt in [0, salts) from `saltSrc`; the small side is
    * exploded ×salts so every (key, salt) bucket finds its match. Same
    * rows as the plain join; the shuffle key becomes (key, salt), so a
    * hot key spreads over `salts` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltSrc: Column): DataFrame = {
    val b = big.withColumn("__salt", pmod(saltSrc, lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic hash sample of documents: keep rows whose portable
    * polynomial hash of (doc_id, source) lands in bucket < `pct` of 100.
    * Reproducible across engines (the DuckDB oracle runs the identical
    * hash), runs, and partitionings — pure map, no shuffle, and the
    * predicate is codegen'd (PortableHashExpr), so at 100 TB this is a
    * scan-speed filter.
    */
  def sampleDocs(docs: DataFrame, pct: Int = 10): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"),
        pmod(docHash, lit(100L)).as("bucket"))
      .where(col("bucket") < pct)
      .orderBy("doc_id")

  /** Oracle SQL twin of [[sampleDocs]]. */
  def sampleDocsOracle(pct: Int = 10): String = {
    val h = docHashSql
    s"""SELECT doc_id, source, n_chars, $h % 100 AS bucket
       |FROM documents WHERE $h % 100 < $pct ORDER BY doc_id""".stripMargin
  }

  /** Fixed-quota stratified sample: exactly min(quota, |stratum|) docs
    * per source, picked as the stratum's smallest portable-hash values —
    * the deterministic, engine-reproducible replacement for per-group
    * reservoir sampling ([[sampleDocs]] keeps a RATE per stratum; this
    * keeps a COUNT — the eval-set / per-domain-cap building block).
    *
    * Scale shape: rank-within-stratum is one shuffle keyed by source.
    * A hot stratum serializes through one task here; at 100 TB swap the
    * row_number for a per-partition top-`quota` heap (mapPartitions)
    * merged by a second top-`quota` pass — same result, no full sort.
    */
  def quotaSample(docs: DataFrame, quota: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = docHash
    docs.select(col("doc_id"), col("source"), h.as("hk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id")))
        .cast("long"))
      .where(col("rk") <= quota)
      .orderBy("source", "rk")
  }

  /** Probability-proportional-to-size (pps) Poisson sample: each doc's
    * inclusion probability is min(1, targetDocs · w / W) where w = its
    * token count and W = the corpus token total — the importance-
    * weighted sampling step of training-data prep (long documents are
    * information-dense; a uniform doc sample under-represents them),
    * with E[sample size] = targetDocs. The float formulation
    * (admit iff u < n·w/W, or the Efraimidis–Spirakis u^(1/w) key)
    * breaks cross-engine hash parity on `pow`/division rounding;
    * here the admission is INTEGER-EXACT: admit iff
    * hb < (w · S · targetDocs) DIV W, where hb = portable-hash bucket
    * in [0, S). Both engines floor identically on positive integers, so
    * the admitted set is bit-reproducible across engines, runs, and
    * partitionings. The threshold quantizes probability to 1/S
    * (S = 2^20) — the bucket side never multiplies W, so the largest
    * intermediate is w·S·targetDocs (overflow-safe until w·targetDocs
    * reaches 2^43; at that scale drop S or widen to DECIMAL(38,0),
    * noting DuckDB raises on BIGINT overflow while non-ANSI Spark
    * wraps).
    *
    * Scale shape: the token total is one scalar partial-agg broadcast
    * back; admission is then a scan-speed codegen'd predicate — no
    * shuffle of the corpus, same as [[sampleDocs]].
    */
  def ppsWeightedSample(docs: DataFrame, targetDocs: Long = 50L): DataFrame = {
    val S = 1048576L // 2^20 probability buckets
    val d = docs.select(col("doc_id"), col("source"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
      pmod(docHash, lit(S)).as("hb"))
    val tot = d.agg(sum(col("n_tokens")).as("__w_total"))
    d.crossJoin(broadcast(tot))
      .where(expr(s"hb < (n_tokens * ${S}L * ${targetDocs}L) DIV __w_total"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Oracle SQL twin of [[ppsWeightedSample]]. */
  def ppsWeightedSampleOracle(targetDocs: Long = 50L): String = {
    val h = docHashSql
    val s = 1048576L
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    $h % $s AS hb
       |  FROM documents
       |), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS w_total FROM d)
       |SELECT doc_id, source, n_tokens
       |FROM d, tot
       |WHERE hb < (n_tokens * $s * $targetDocs) // w_total
       |ORDER BY doc_id""".stripMargin
  }

  /** Domain-mixture sampling to a DECLARED target mix — the corpus
    * rebalancing step of training-data prep (web-heavy crawls get
    * downsampled, rare domains kept whole): given integer target
    * weights per source and a total token budget, each source admits
    * docs at the rate that hits its budget share in expectation,
    * r_i = min(1, B·w_i/Σw / tok_i). Admission is the [[ppsWeightedSample]]
    * integer-exact cross-multiplied hash threshold — admit iff
    * hb · tok_i · Σw < S · B · w_i, every operand an exact integer, so
    * the admitted set is bit-reproducible across engines (uniform
    * doc-level admission within a source preserves token mass in
    * expectation). Sources missing from `targets` get weight 0 — they
    * are dropped, loudly visible in the summary (n_admitted = 0), not
    * silently. Output per source: docs, admitted docs, admitted
    * tokens, and the integer target (B·w_i) DIV Σw the rate aimed at.
    *
    * Scale shape: per-source token totals are one tiny aggregate
    * broadcast back; admission is then a scan-speed predicate; the
    * summary partial-aggregates before its shuffle. Overflow bound:
    * hb·tok_i·Σw < 2^20 · corpus tokens · Σw must stay under 2^63 —
    * at larger scales drop S or widen to DECIMAL(38,0) (the q87 note).
    */
  def domainMixSample(docs: DataFrame, targets: Seq[(String, Long)],
                      budgetTokens: Long = 20000L): DataFrame = {
    val S = 1048576L // 2^20 probability buckets, as ppsWeightedSample
    val sumW = targets.map(_._2).sum
    val wCol = targets.foldRight(lit(0L)) { case ((src, w), other) =>
      when(col("source") === src, lit(w)).otherwise(other)
    }
    val d = docs.select(col("doc_id"), col("source"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
      pmod(docHash, lit(S)).as("hb"), wCol.as("w"))
    val perSrc = d.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    d.join(broadcast(perSrc), Seq("source"))
      .withColumn("admit",
        (col("hb") * col("src_tokens") * lit(sumW)) <
          (lit(S) * lit(budgetTokens) * col("w")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admit"), col("n_tokens")).otherwise(0L))
          .as("admitted_tokens"),
        expr(s"CAST((max(w) * ${budgetTokens}L) DIV ${sumW}L AS BIGINT)")
          .as("target_tokens"))
      .orderBy("source")
  }

  /** Temperature-rebalanced mixture sampling (T = 2): per-source admit
    * rates aimed at token shares ∝ √(source tokens) — the UniMax-style
    * rebalance that upweights rare domains without declared weights
    * ([[domainMixSample]]'s data-derived sibling; T = 1 is proportional
    * = no rebalance, T → ∞ is uniform). The ONLY non-rational step,
    * w_s = ⌊√tokens_s⌋, is safe under the parity rules: IEEE sqrt is
    * correctly rounded in both engines, so the floor is bit-identical
    * (unlike pow/log, which are libm-dependent — the q87 lesson).
    * Admission reuses the integer-exact cross-multiplied hash
    * threshold: admit iff hb·tokens_s·Σw < S·B·w_s, every operand an
    * exact integer.
    *
    * Scale shape: one per-source token rollup (tiny, broadcast back),
    * one scalar Σw broadcast, then admission is a scan-speed predicate
    * and the summary partial-aggregates before its single shuffle.
    */
  def temperatureMixSample(docs: DataFrame,
                           budgetTokens: Long = 20000L): DataFrame = {
    val S = 1048576L // 2^20 probability buckets, as ppsWeightedSample
    val d = docs.select(col("doc_id"), col("source"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
      pmod(docHash, lit(S)).as("hb"))
    val perSrc = d.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("w",
        floor(sqrt(col("src_tokens").cast("double"))).cast("long"))
    val tot = perSrc.agg(sum(col("w")).as("sum_w"))
    d.join(broadcast(perSrc), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("admit",
        (col("hb") * col("src_tokens") * col("sum_w")) <
          (lit(S) * lit(budgetTokens) * col("w")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("w")).as("w"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admit"), col("n_tokens")).otherwise(0L))
          .as("admitted_tokens"),
        call_function("div", max(col("w")) * lit(budgetTokens),
          max(col("sum_w"))).as("target_tokens"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[temperatureMixSample]]. */
  def temperatureMixSampleOracle(budgetTokens: Long = 20000L): String = {
    val h = docHashSql
    val s = 1048576L
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    $h % $s AS hb
       |  FROM documents
       |), t AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
       |    CAST(floor(sqrt(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)))
       |      AS BIGINT) AS w
       |  FROM d GROUP BY 1
       |), sw AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM t)
       |SELECT d.source, count(*) AS n_docs, max(t.w) AS w,
       |  CAST(sum(CASE WHEN d.hb * t.src_tokens * sw.sum_w
       |                     < CAST($s AS BIGINT) * $budgetTokens * t.w
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(sum(CASE WHEN d.hb * t.src_tokens * sw.sum_w
       |                     < CAST($s AS BIGINT) * $budgetTokens * t.w
       |                THEN d.n_tokens ELSE 0 END) AS BIGINT)
       |    AS admitted_tokens,
       |  (max(t.w) * $budgetTokens) // max(sw.sum_w) AS target_tokens
       |FROM d JOIN t USING (source), sw
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** Oracle SQL twin of [[domainMixSample]]. */
  def domainMixSampleOracle(targets: Seq[(String, Long)],
                            budgetTokens: Long = 20000L): String = {
    val h = docHashSql
    val s = 1048576L
    val sumW = targets.map(_._2).sum
    val wCase = targets.map { case (src, w) =>
      s"WHEN source = '$src' THEN ${w}" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    $h % $s AS hb,
       |    CAST(CASE $wCase ELSE 0 END AS BIGINT) AS w
       |  FROM documents
       |), t AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
       |  FROM d GROUP BY 1
       |)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN d.hb * t.src_tokens * $sumW
       |                     < d.w * $s * $budgetTokens
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(sum(CASE WHEN d.hb * t.src_tokens * $sumW
       |                     < d.w * $s * $budgetTokens
       |                THEN d.n_tokens ELSE 0 END) AS BIGINT) AS admitted_tokens,
       |  (max(d.w) * $budgetTokens) // $sumW AS target_tokens
       |FROM d JOIN t ON t.source = d.source
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Deterministic stratified train/val/test split, summarized per
    * (source, split): each doc's split comes from its content-hash
    * bucket (90/5/5 by default), so the assignment is reproducible
    * across engines, runs, and cluster sizes — and because the hash is
    * per-doc, every source is split at the same RATE (a doc-count
    * threshold split would starve small sources of val/test rows). The
    * assignment itself is a scan-speed codegen'd map; the summary is
    * one partial-aggregated shuffle on (source, split).
    */
  def splitAssign(docs: DataFrame, trainPct: Int = 90,
                  valPct: Int = 5): DataFrame = {
    val bucket = pmod(docHash,
      lit(100L))
    val split = when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
    docs.select(col("source"), split.as("split"), col("n_chars"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")
  }

  /** Oracle SQL twin of [[splitAssign]]. */
  def splitAssignOracle(trainPct: Int = 90, valPct: Int = 5): String = {
    val h = docHashSql
    s"""SELECT source,
       |  CASE WHEN $h % 100 < $trainPct THEN 'train'
       |       WHEN $h % 100 < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Token-budget domain mixing: admit the LONGEST PREFIX of each
    * source's documents, in deterministic content-hash order, whose
    * token total fits the budget — the "N tokens per domain"
    * corpus-composition step of training-data prep, reproducible
    * because admission order is a hash, not `rand()`. (Prefix
    * semantics, not skip-and-continue knapsack: the first doc that
    * overflows the budget ends the source's admission — simpler, and
    * identical in SQL on both engines.) One shuffle keyed by source; the running sum
    * is a window over the (hash, doc_id) order, so reruns at any
    * parallelism admit the identical doc set. A hot source serializes
    * through one window task here; at 100 TB the same greedy fill runs
    * as a per-partition partial fill + one merge pass (the
    * [[quotaSample]] scale note, in token units).
    */
  def tokenBudgetMix(docs: DataFrame, budget: Long = 500L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = docHash
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
        h.as("hk"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "doc_id")
  }

  /** Oracle SQL twin of [[tokenBudgetMix]]. */
  def tokenBudgetMixOracle(budget: Long = 500L): String = {
    val h = docHashSql
    s"""SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY hk, doc_id) AS cum
       |  FROM (SELECT doc_id, source,
       |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |          $h AS hk
       |        FROM documents) b) t
       |WHERE cum <= $budget ORDER BY source, doc_id""".stripMargin
  }

  /** Covariate-shift importance weights over the length feature — the
    * density-ratio estimator a train/serve skew correction starts
    * from: documents binned by length (200-char bins, capped at bin 9),
    * split train/val by the content-hash rule, and each bin's weight
    * is the ratio of its val share to its train share,
    * w(b) = (n_val_b/N_val) / (n_train_b/N_train), in ppm. Reweighting
    * train examples by w(b) makes the train length distribution match
    * val's — the standard histogram-based importance weighting; a bin
    * with train mass but no val mass weights 0, a bin with val mass
    * but NO train mass reports NULL (the uncorrectable-support case a
    * consumer must see, not a silent 0).
    *
    * Scale shape: bin and split are row-local off one scan; one
    * map-side-combined (bin)-rollup carrying both splits' counts; the
    * two totals ride the same 10-row frame (a window over the bins
    * would shuffle the same bytes — the frame is already tiny). Count
    * products promote to DECIMAL(38,0)/HUGEINT before multiplying.
    */
  def covariateShiftWeights(docs: DataFrame, trainPct: Int = 90,
                            valPct: Int = 5): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val bucket = pmod(docHash, lit(100L))
    val bin = least(expr("n_chars DIV 200"), lit(9L)).cast("long")
    val perBin = docs
      .select(bin.as("len_bin"), bucket.as("b"))
      .groupBy(col("len_bin"))
      .agg(sum(when(col("b") < trainPct, 1L).otherwise(0L)).as("n_train"),
        sum(when(col("b") >= trainPct && col("b") < trainPct + valPct, 1L)
          .otherwise(0L)).as("n_val"))
    val tot = perBin.agg(sum(col("n_train")).as("nt"),
      sum(col("n_val")).as("nv"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    perBin.crossJoin(broadcast(tot))
      .select(col("len_bin"), col("n_train"), col("n_val"),
        when(col("n_train") > 0L && col("nv") > 0L,
          halfUpDiv(dec(col("n_val")) * col("nt") * 1000000L,
            dec(col("n_train")) * col("nv"))).as("weight_ppm"))
      .orderBy("len_bin")
  }

  /** Oracle SQL twin of [[covariateShiftWeights]]. */
  def covariateShiftWeightsOracle(trainPct: Int = 90,
                                  valPct: Int = 5): String = {
    import graft.functions.DetAgg.halfUpDivHugeSql
    val h = docHashSql
    s"""WITH b AS (
       |  SELECT least(n_chars // 200, 9) AS len_bin, ($h) % 100 AS bk
       |  FROM documents
       |), pb AS (
       |  SELECT len_bin,
       |    CAST(sum(CASE WHEN bk < $trainPct THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_train,
       |    CAST(sum(CASE WHEN bk >= $trainPct
       |      AND bk < ${trainPct + valPct} THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_val
       |  FROM b GROUP BY 1
       |), t AS (
       |  SELECT CAST(sum(n_train) AS BIGINT) AS nt,
       |    CAST(sum(n_val) AS BIGINT) AS nv
       |  FROM pb
       |)
       |SELECT len_bin, n_train, n_val,
       |  CASE WHEN n_train > 0 AND nv > 0 THEN
       |    ${halfUpDivHugeSql("CAST(n_val AS HUGEINT) * nt * 1000000",
                               "CAST(n_train AS HUGEINT) * nv")}
       |  END AS weight_ppm
       |FROM pb, t ORDER BY len_bin""".stripMargin
  }

  /** Quality-ranked token budget per source — [[tokenBudgetMix]]'s
    * curriculum sibling: where the hash-order fill is an UNBIASED
    * sample, this fills each source's budget BEST-DOCS-FIRST (by the
    * integer unique-token-ratio ppm, doc_id ties), the "spend the
    * token budget on the cleanest text" curation policy, and reports
    * the per-source yield: docs seen, docs kept, tokens kept, and
    * budget utilization. Comparing its kept-token quality against
    * q71's hash fill is exactly the curriculum-vs-coverage tradeoff a
    * data-mix owner tunes.
    *
    * Scale shape: signals are row-local; ONE shuffle keyed by source;
    * the greedy fill is a running sum over the (quality desc, doc_id)
    * order within each source's window, then a tiny per-source rollup.
    * A hot source serializes through one window task — the
    * [[tokenBudgetMix]] caveat; the per-partition partial-fill + merge
    * pass is the same documented 100 TB fallback.
    */
  def qualityBudget(docs: DataFrame, budget: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.halfUpDiv
    val toks = TextFunctions.tokens(col("text"))
    val base = docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        when(col("n_tokens") > 0L,
          halfUpDiv(col("n_uniq") * 1000000L, col("n_tokens")))
          .otherwise(0L).as("q_ppm"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q_ppm").desc, col("doc_id"))
    base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum_tokens") <= budget, 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("cum_tokens") <= budget, col("n_tokens"))
          .otherwise(0L)).as("kept_tokens"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("kept_tokens"),
        halfUpDiv(col("kept_tokens") * 1000000L, lit(budget))
          .as("util_ppm"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[qualityBudget]]. */
  def qualityBudgetOracle(budget: Long = 4000L): String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH b AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |      AS n_uniq
       |  FROM documents
       |), q AS (
       |  SELECT doc_id, source, n_tokens,
       |    CASE WHEN n_tokens > 0
       |      THEN ${halfUpDivSql("n_uniq * 1000000", "n_tokens")}
       |      ELSE 0 END AS q_ppm
       |  FROM b
       |), c AS (
       |  SELECT source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY q_ppm DESC, doc_id) AS cum
       |  FROM q
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN cum <= $budget THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(CASE WHEN cum <= $budget THEN n_tokens ELSE 0 END)
       |    AS BIGINT) AS kept_tokens,
       |  ${halfUpDivSql(
           s"sum(CASE WHEN cum <= $budget THEN n_tokens ELSE 0 END)" +
             " * 1000000", s"$budget")} AS util_ppm
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Sequence-packing assignment — the pretraining step that turns a
    * doc stream into fixed-length training examples: concatenate each
    * source's documents in deterministic hash order and cut the token
    * stream every `seqLen` tokens. Emits each doc's coordinates in
    * that layout — bin (sequence index), offset within the bin, and a
    * flag for docs spanning a cut — so the downstream tokenizer writes
    * examples without ever materializing the concatenation. All
    * arithmetic is integer-exact on the running token count; the only
    * shuffle is the per-source window (same scale stance as
    * [[tokenBudgetMix]]: at 100 TB the cumsum becomes a per-partition
    * partial + one merge of partition subtotals).
    */
  def sequencePack(docs: DataFrame, seqLen: Long = 512L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val h = docHash
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
        h.as("hk"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("endt", col("start") + col("n_tokens") - 1L)
      // DIV: integer division on longs (`/` detours through double)
      .withColumn("bin", expr(s"start DIV $seqLen"))
      .withColumn("offset", pmod(col("start"), lit(seqLen)))
      .withColumn("spans_cut",
        (expr(s"endt DIV $seqLen") =!= col("bin")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("bin"), col("offset"), col("spans_cut"))
      .orderBy("source", "doc_id")
  }

  /** The [[sequencePack]] SQL sans presentation sort — shared by the
    * q74 oracle and the q217 packing-efficiency rollup (ONE definition
    * of the layout both audit).
    */
  private def sequencePackSqlCore(seqLen: Long): String = {
    val h = docHashSql
    s"""SELECT doc_id, source, n_tokens,
       |  strt // $seqLen AS bin,
       |  strt % $seqLen AS "offset",
       |  CAST((strt + n_tokens - 1) // $seqLen <> strt // $seqLen AS BIGINT)
       |    AS spans_cut
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY hk, doc_id) - n_tokens AS BIGINT) AS strt
       |  FROM (SELECT doc_id, source,
       |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |          $h AS hk
       |        FROM documents) b) t""".stripMargin
  }

  /** Oracle SQL twin of [[sequencePack]]. */
  def sequencePackOracle(seqLen: Long = 512L): String =
    s"""${sequencePackSqlCore(seqLen)}
       |ORDER BY source, doc_id""".stripMargin

  /** Packing-efficiency rollup over [[sequencePack]]'s layout — the
    * training-cost dashboard for contiguous packing: per source, the
    * bin count, padding waste (only the final partial bin pads in a
    * contiguous pack — the metric that explodes if packing ever
    * switches to doc-aligned), and how many documents the fixed
    * sequence boundary CUTS (the quality cost contiguous packing pays
    * instead of padding). fill/cut as exact ppm rationals.
    *
    * Scale shape: one groupBy(source) over the pack layout; the layout
    * itself is q74's single source-keyed window sort.
    */
  def packingEfficiency(docs: DataFrame, seqLen: Long = 512L): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    sequencePack(docs, seqLen)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("spans_cut")).as("n_cut_docs"))
      // bins = ceil(total/seqLen): the LAST doc may spill past the max
      // START bin, so deriving bins from `max(bin)` would undercount
      .withColumn("n_bins",
        expr(s"(total_tokens + ${seqLen - 1}) DIV $seqLen"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_bins"),
        (col("n_bins") * seqLen - col("total_tokens")).as("pad_tokens"),
        halfUpDiv(col("total_tokens") * 1000000L, col("n_bins") * seqLen)
          .as("fill_ppm"),
        halfUpDiv(col("n_cut_docs") * 1000000L, col("n_docs"))
          .as("cut_ppm"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[packingEfficiency]]. */
  def packingEfficiencyOracle(seqLen: Long = 512L): String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH sp AS (
       |${sequencePackSqlCore(seqLen)}
       |), g AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    (CAST(sum(n_tokens) AS BIGINT) + ${seqLen - 1}) // $seqLen
       |      AS n_bins,
       |    CAST(sum(spans_cut) AS BIGINT) AS n_cut_docs
       |  FROM sp GROUP BY 1
       |)
       |SELECT source, n_docs, total_tokens, n_bins,
       |  n_bins * $seqLen - total_tokens AS pad_tokens,
       |  ${halfUpDivSql("total_tokens * 1000000", s"n_bins * $seqLen")}
       |    AS fill_ppm,
       |  ${halfUpDivSql("n_cut_docs * 1000000", "n_docs")} AS cut_ppm
       |FROM g ORDER BY source""".stripMargin
  }

  /** Oracle SQL twin of [[quotaSample]]. */
  def quotaSampleOracle(quota: Int = 10): String = {
    val h = docHashSql
    s"""SELECT doc_id, source, hk, rk FROM (
       |  SELECT doc_id, source, $h AS hk,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY $h, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= $quota ORDER BY source, rk""".stripMargin
  }

  /** Event-row sampling hash — reversed id so consecutive ids spread
    * across the hash space (the [[docHash]] convention). */
  private[operators] def eventHash: Column =
    TextFunctions.portableHash(reverse(col("event_id").cast("string")))
  private[operators] def eventHashSql: String =
    TextFunctions.portableHashSql("reverse(CAST(event_id AS VARCHAR))")

  /** q158: per-group value quantiles from a BOUNDED bottom-k-by-hash
    * sample ([[graft.functions.BottomKAgg]]) — the mergeable-sketch
    * answer to "what does the value distribution look like per group"
    * at 100 TB: exact quantiles shuffle every row into a per-group
    * sort (the q07 collect path — fine while a group fits an
    * executor), `percentile_approx` is mergeable but engine-specific
    * (rows-only oracle, the q57 HLL situation); the bottom-k sample is
    * BOTH bounded (every map-side partial ≤ k rows, so a group costs
    * k·|partitions| shuffled rows) AND deterministic cross-engine (the
    * portable hash is the PRNG, so the oracle re-derives the identical
    * sample and the identical quantiles — full hash gate, no error
    * bound needed). Quantile convention: exact 1-indexed
    * `(n·q) DIV d + 1` on the sample sorted by (value, id), the
    * [[OutlierOp.thresholds]] index discipline; quantile values are
    * raw sample members, passed through unrounded.
    */
  def sampledQuantiles(events: DataFrame, k: Int = 64): DataFrame = {
    val sampled = events
      .select(col("event_type"), eventHash.as("hx"),
        col("event_id").as("id"), col("value").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.BottomKExpr.column(
          col("hx"), col("id"), col("v"), k).as("sample"))
    val vs = array_sort(transform(col("sample"),
      r => struct(r.getField("v").as("v"), r.getField("id").as("id"))))
    def q(num: Int, den: Int): Column =
      element_at(col("vs"),
        expr(s"CAST(ns * $num DIV $den + 1 AS INT)")).getField("v")
    sampled
      .select(col("event_type"), col("n_events"),
        size(col("sample")).cast("long").as("ns"), vs.as("vs"))
      .select(col("event_type"), col("n_events"), col("ns").as("n_sample"),
        q(1, 4).as("p25"), q(1, 2).as("p50"), q(3, 4).as("p75"),
        q(9, 10).as("p90"))
      .orderBy("event_type")
  }

  /** Oracle SQL twin of [[sampledQuantiles]] — the identical sample
    * re-derived with a rank window over the same portable hash, the
    * identical index quantiles. */
  def sampledQuantilesOracle(k: Int = 64): String = {
    val h = eventHashSql
    s"""WITH base AS (
       |  SELECT event_type, event_id, value, $h AS hx FROM events
       |), tot AS (
       |  SELECT event_type, count(*) AS n_events FROM base GROUP BY 1
       |), samp AS (
       |  SELECT event_type, event_id, value FROM (
       |    SELECT event_type, event_id, value,
       |      row_number() OVER (PARTITION BY event_type
       |        ORDER BY hx, event_id) AS rn
       |    FROM base) t WHERE rn <= $k
       |), ranked AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY value, event_id) AS vrn,
       |    count(*) OVER (PARTITION BY event_type) AS ns
       |  FROM samp
       |)
       |SELECT t.event_type, CAST(t.n_events AS BIGINT) AS n_events,
       |  CAST(r.ns AS BIGINT) AS n_sample,
       |  max(CASE WHEN vrn = (ns * 1) // 4 + 1 THEN value END) AS p25,
       |  max(CASE WHEN vrn = (ns * 1) // 2 + 1 THEN value END) AS p50,
       |  max(CASE WHEN vrn = (ns * 3) // 4 + 1 THEN value END) AS p75,
       |  max(CASE WHEN vrn = (ns * 9) // 10 + 1 THEN value END) AS p90
       |FROM ranked r JOIN tot t USING (event_type)
       |GROUP BY t.event_type, t.n_events, r.ns
       |ORDER BY t.event_type""".stripMargin
  }

  /** q162: per-source distinct-token estimation by the KMV
    * (k-minimum-values) sketch — the DETERMINISTIC answer to the q57
    * problem: HLL's sketch is engine-specific, so approx distinct
    * could only ever get a rows-only oracle, while KMV's estimate
    * (k−1)·M / h_k is a pure integer function of the k smallest
    * DISTINCT portable-hash values, which the oracle re-derives
    * exactly — an approximate-cardinality operator under the FULL
    * hash gate, estimator error and all. Audited against the exact
    * distinct-hash count with the error in ppm (floor division;
    * under-full groups fall back to the exact sample size, error 0).
    *
    * Scale shape: [[graft.functions.BottomKAgg]] with set semantics —
    * every map-side partial is ≤ k rows (where exact countDistinct
    * shuffles the vocabulary), merge is the linear dedup-merge; the
    * exact-truth column exists only because this is the AUDIT form
    * (the sketch-only production form drops it, as with q138's
    * count-min).
    */
  def kmvDistinct(docs: DataFrame, k: Int = 16): DataFrame = {
    val M = TextFunctions.HashMod
    val hx = docs
      .select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("source"), TextFunctions.portableHash(col("tok")).as("hx"))
    val agg = hx.groupBy(col("source"))
      .agg(countDistinct(col("hx")).as("n_true"),
        graft.functions.BottomKExpr.column(col("hx"), col("hx"),
          lit(0.0), k, distinctKeys = true).as("sample"))
    val est = when(size(col("sample")) < k,
        size(col("sample")).cast("long"))
      .otherwise(call_function("div", lit((k - 1).toLong * M),
        element_at(col("sample"), k).getField("hx")))
    agg.select(col("source"), col("n_true"), est.as("kmv_est"))
      .select(col("source"), col("n_true"), col("kmv_est"),
        call_function("div",
          abs(col("kmv_est") - col("n_true")) * 1000000L,
          col("n_true")).as("err_ppm"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[kmvDistinct]] — distinct hashes, the k-th
    * order statistic per source, the same integer estimator. */
  def kmvDistinctOracle(k: Int = 16): String = {
    val M = TextFunctions.HashMod
    val h = TextFunctions.portableHashSql("tok")
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok
       |  FROM documents
       |), hxs AS (
       |  SELECT DISTINCT source, $h AS hx FROM toks
       |), tot AS (
       |  SELECT source, count(*) AS n_true FROM hxs GROUP BY 1
       |), rk AS (
       |  SELECT source, hx,
       |    row_number() OVER (PARTITION BY source ORDER BY hx) AS rn
       |  FROM hxs
       |), hk AS (
       |  SELECT source, hx AS hk FROM rk WHERE rn = $k
       |), est AS (
       |  SELECT t.source, t.n_true,
       |    CASE WHEN t.n_true < $k THEN t.n_true
       |         ELSE ${(k - 1).toLong * M}::BIGINT // h.hk END AS kmv_est
       |  FROM tot t LEFT JOIN hk h USING (source)
       |)
       |SELECT source, CAST(n_true AS BIGINT) AS n_true,
       |  CAST(kmv_est AS BIGINT) AS kmv_est,
       |  CAST((abs(kmv_est - n_true) * 1000000) // n_true AS BIGINT)
       |    AS err_ppm
       |FROM est ORDER BY source""".stripMargin
  }

  /** Token-balanced training-shard assignment — serpentine (boustro-
    * phedon) deal: docs ordered by (token count desc, doc_id) are dealt
    * round-robin with the direction REVERSED every round, so each shard
    * gets one doc per round and alternating rounds cancel the
    * within-round size gradient (the classic LPT-style balancer that
    * stays a pure rank function — no greedy state). Emits per-shard doc
    * and token totals plus each shard's token share in ppm; a training
    * run reading one shard per worker gets near-equal token budgets.
    *
    * Scale shape: ONE global sort shuffle on (n_tokens, doc_id) — the
    * same range-partitioned TeraSort shape any global ordering costs —
    * then the 8-row rollup. The ppm share is a window over `shards`
    * aggregate rows, not over docs.
    */
  def shardAssign(docs: DataFrame, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.halfUpDiv
    val n = size(TextFunctions.tokens(col("text"))).cast("long")
    val rn = row_number().over(
      Window.orderBy(col("n_tokens").desc, col("doc_id"))) - 1
    val base = docs.select(col("doc_id"), n.as("n_tokens"))
      .withColumn("rn", rn)
      .withColumn("k", col("rn") % shards)
      .withColumn("shard",
        when(expr(s"rn DIV $shards") % 2 === 0, col("k"))
          .otherwise(lit(shards - 1) - col("k")))
    val agg = base.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    agg.withColumn("share_ppm",
        halfUpDiv(col("total_tokens") * 1000000L,
          sum(col("total_tokens")).over(Window.partitionBy())))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("total_tokens"), col("share_ppm"))
      .orderBy("shard")
  }

  /** Oracle SQL twin of [[shardAssign]]. */
  def shardAssignOracle(shards: Int = 8): String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rn
       |  FROM d
       |), a AS (
       |  SELECT CASE WHEN (rn // $shards) % 2 = 0 THEN rn % $shards
       |              ELSE ${shards - 1} - (rn % $shards) END AS shard,
       |    n_tokens
       |  FROM r
       |), g AS (
       |  SELECT shard, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM a GROUP BY 1
       |)
       |SELECT CAST(shard AS BIGINT) AS shard, n_docs, total_tokens,
       |  ${halfUpDivSql("total_tokens * 1000000", "sum(total_tokens) OVER ()")}
       |    AS share_ppm
       |FROM g ORDER BY shard""".stripMargin
  }

  /** q253: [[shardAssign]]'s approx-binned arm — the 100× scale path
    * for the one global sort the serpentine deal costs: docs are
    * first assigned to `bins` token-count bins by sampled boundaries
    * ([[sampledBinIntervals]], broadcast map-side join), then the
    * serpentine deal runs WITHIN each bin — a window PARTITIONED by
    * bin (bins-wide parallelism, no single-task global order). Docs
    * inside a bin differ by at most one boundary step in size, so
    * per-bin dealing preserves the balance the global deal buys;
    * ShardBinnedSpec bounds the per-shard token-share deviation
    * against the exact arm at sf0.01. Same output shape; own
    * hash-gated oracle.
    */
  def shardAssignBinned(docs: DataFrame, shards: Int = 8,
                        bins: Int = 64, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.halfUpDiv
    val n = size(TextFunctions.tokens(col("text"))).cast("long")
    val base = docs.select(col("doc_id"), n.as("n_tokens"))
    val hx = TextFunctions.portableHash(
      reverse(col("doc_id").cast("string")))
    val iv = sampledBinIntervals(base, hx, col("doc_id"),
      col("n_tokens"), bins, k)
    val rn = row_number().over(
      Window.partitionBy(col("bin"))
        .orderBy(col("n_tokens").desc, col("doc_id"))) - 1
    val dealt = binAssign(base, iv, col("n_tokens"))
      .withColumn("rn", rn)
      .withColumn("kk", col("rn") % shards)
      .withColumn("shard",
        when(expr(s"rn DIV $shards") % 2 === 0, col("kk"))
          .otherwise(lit(shards - 1) - col("kk")))
    val agg = dealt.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
    agg.withColumn("share_ppm",
        halfUpDiv(col("total_tokens") * 1000000L,
          sum(col("total_tokens")).over(Window.partitionBy())))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("total_tokens"), col("share_ppm"))
      .orderBy("shard")
  }

  /** Oracle SQL twin of [[shardAssignBinned]]. */
  def shardAssignBinnedOracle(shards: Int = 8, bins: Int = 64,
                              k: Int = 256): String = {
    import graft.functions.DetAgg.halfUpDivSql
    val h = TextFunctions.portableHashSql(
      "reverse(CAST(doc_id AS VARCHAR))")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), ${binIntervalsSql(
            s"(SELECT $h AS hx, doc_id AS id, n_tokens AS v FROM d)",
            bins, k)},
       |r AS (
       |  SELECT iv.bin, d.n_tokens,
       |    row_number() OVER (PARTITION BY iv.bin
       |      ORDER BY d.n_tokens DESC, d.doc_id) - 1 AS rn
       |  FROM d
       |  JOIN iv ON (iv.lo IS NULL OR d.n_tokens > iv.lo)
       |    AND (iv.hi IS NULL OR d.n_tokens <= iv.hi)
       |), a AS (
       |  SELECT CASE WHEN (rn // $shards) % 2 = 0 THEN rn % $shards
       |              ELSE ${shards - 1} - (rn % $shards) END AS shard,
       |    n_tokens
       |  FROM r
       |), g AS (
       |  SELECT shard, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM a GROUP BY 1
       |)
       |SELECT CAST(shard AS BIGINT) AS shard, n_docs, total_tokens,
       |  ${halfUpDivSql("total_tokens * 1000000", "sum(total_tokens) OVER ()")}
       |    AS share_ppm
       |FROM g ORDER BY shard""".stripMargin
  }

  /** Split-balance χ² audit — does the [[splitAssign]] hash REALLY
    * deal each source ~90/5/5? Per source: observed split counts and
    * the exact Pearson χ² statistic (ppm) against the declared
    * percentages, every term integer-rational
    * ((100·O − n·pct)² / (100·n·pct), half-up to ppm, SUMMED AS
    * INTEGERS — fold-order-proof, the q131 rule). A big χ² on a big
    * source means the hash correlates with that source's ids — the
    * check that catches a broken split before a leaky eval does.
    *
    * Scale shape: one groupBy(source) with map-side conditional-sum
    * partials; the χ² arithmetic runs on the |sources|-row aggregate.
    */
  def splitBalanceAudit(docs: DataFrame, trainPct: Int = 90,
                        valPct: Int = 5): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val testPct = 100 - trainPct - valPct
    val bucket = pmod(docHash, lit(100L))
    val split = when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
    def term(obs: Column, pct: Int): Column = {
      val d = obs * 100L - col("n") * pct.toLong
      halfUpDiv(d * d * 1000000L, col("n") * (100L * pct))
    }
    docs.select(col("source"), split.as("split"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .select(col("source"), col("n"), col("n_train"), col("n_val"),
        col("n_test"),
        (term(col("n_train"), trainPct) + term(col("n_val"), valPct) +
          term(col("n_test"), testPct)).as("chi2_ppm"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[splitBalanceAudit]]. */
  def splitBalanceAuditOracle(trainPct: Int = 90, valPct: Int = 5): String = {
    import graft.functions.DetAgg.halfUpDivSql
    val testPct = 100 - trainPct - valPct
    val h = docHashSql
    def term(obs: String, pct: Int) = halfUpDivSql(
      s"(100 * $obs - n * $pct) * (100 * $obs - n * $pct) * 1000000",
      s"n * ${100L * pct}")
    s"""WITH s AS (
       |  SELECT source,
       |    CASE WHEN $h % 100 < $trainPct THEN 'train'
       |         WHEN $h % 100 < ${trainPct + valPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |), c AS (
       |  SELECT source, count(*) AS n,
       |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_train,
       |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_val,
       |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_test
       |  FROM s GROUP BY 1
       |)
       |SELECT source, n, n_train, n_val, n_test,
       |  (${term("n_train", trainPct)} + ${term("n_val", valPct)}
       |    + ${term("n_test", testPct)}) AS chi2_ppm
       |FROM c ORDER BY source""".stripMargin
  }

  // ---- sampled-quantile bin boundaries (the approx-rank machinery) ----
  //
  // The scale-out replacement for an unpartitioned Window.orderBy rank:
  // exact global rank single-threads one task per ranked column (fine on
  // an aggregated frame today, `weak` at 100× — the q204/RFM/ABC/q226
  // family), while a BOTTOM-K-BY-HASH sample ([[graft.functions
  // .BottomKAgg]] — mergeable, every map-side partial ≤ k rows) yields
  // deterministic bin boundaries that broadcast back as a ≤bins-row
  // interval frame; assignment is then a map-side broadcast join, no
  // global sort anywhere. Deterministic cross-engine because the
  // portable hash is the PRNG (the q158 stance), so the binned variants
  // hash-gate like everything else — an approx operator under the FULL
  // oracle gate, sampling error and all.

  /** The (bins−1) sampled boundary values for `v` as a ≤bins-row
    * interval frame `(bin, lo, hi)` tiling (−∞, +∞]: bin 1 is
    * (−∞, b₁], bin `bins` is (b_{bins−1}, +∞), interior bins
    * (b_{j−1}, b_j]. Boundary j = sample value at 1-indexed rank
    * `ns·j DIV bins + 1` of the sample sorted by (v, id) — the
    * [[sampledQuantiles]] index convention. Duplicate boundary values
    * (heavy ties, small samples) yield empty intervals, never double
    * assignment. One global BottomKAgg aggregate (bounded, mergeable)
    * + array ops on the single result row.
    */
  def sampledBinIntervals(df: DataFrame, hx: Column, id: Column,
                          v: Column, bins: Int,
                          k: Int = 256): DataFrame = {
    val samp = df.select(hx.as("hx"), id.cast("long").as("id"),
        v.cast("double").as("v"))
      .agg(graft.functions.BottomKExpr.column(
        col("hx"), col("id"), col("v"), k).as("sample"))
    val vs = array_sort(transform(col("sample"),
      r => struct(r.getField("v").as("v"), r.getField("id").as("id"))))
    samp.select(vs.as("vs"), size(col("sample")).cast("long").as("ns"))
      .select(explode(sequence(lit(1L), lit(bins.toLong))).as("bin"),
        col("vs"), col("ns"))
      .select(col("bin"),
        when(col("bin") === 1L, lit(null).cast("double"))
          .otherwise(element_at(col("vs"),
            expr(s"CAST(ns * (bin - 1) DIV $bins + 1 AS INT)"))
            .getField("v")).as("lo"),
        when(col("bin") === bins.toLong, lit(null).cast("double"))
          .otherwise(element_at(col("vs"),
            expr(s"CAST(ns * bin DIV $bins + 1 AS INT)"))
            .getField("v")).as("hi"))
  }

  /** Assign each row of `df` its bin: a broadcast join against the
    * ≤bins-row interval frame — map-side, codegen'd comparisons, no
    * global sort. Every row matches exactly one interval by
    * construction.
    */
  def binAssign(df: DataFrame, intervals: DataFrame,
                v: Column): DataFrame =
    df.join(broadcast(intervals),
      (col("lo").isNull || v.cast("double") > col("lo")) &&
        (col("hi").isNull || v.cast("double") <= col("hi")))
      .drop("lo", "hi")

  /** Oracle SQL twin of [[sampledBinIntervals]]: CTEs `<p>rk` (the
    * ranked sample), `<p>bnd` (boundaries), `<p>iv` (the interval
    * frame with columns bin/lo/hi). `base` must expose columns
    * `hx, id, v`. Consumers join
    * `ON (lo IS NULL OR x > lo) AND (hi IS NULL OR x <= hi)`.
    */
  def binIntervalsSql(base: String, bins: Int, k: Int = 256,
                      p: String = ""): String =
    s"""${p}rk AS (
       |  SELECT v, row_number() OVER (ORDER BY v, id) AS vrn,
       |    count(*) OVER () AS ns
       |  FROM (SELECT v, id FROM (
       |      SELECT v, id, row_number() OVER (ORDER BY hx, id) AS rn
       |      FROM $base) t
       |    WHERE rn <= $k) s
       |), ${p}bnd AS (
       |  SELECT jj.j AS j,
       |    max(CASE WHEN r.vrn = (r.ns * jj.j) // $bins + 1
       |        THEN r.v END) AS b
       |  FROM ${p}rk r, (SELECT CAST(range AS BIGINT) AS j
       |                  FROM range(1, $bins)) jj
       |  GROUP BY 1
       |), ${p}iv AS (
       |  SELECT bb.bin AS bin, lo.b AS lo, hi.b AS hi
       |  FROM (SELECT CAST(range AS BIGINT) AS bin
       |        FROM range(1, ${bins + 1})) bb
       |  LEFT JOIN ${p}bnd lo ON lo.j = bb.bin - 1
       |  LEFT JOIN ${p}bnd hi ON hi.j = bb.bin
       |)""".stripMargin
}
