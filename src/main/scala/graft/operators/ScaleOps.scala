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
        pmod(TextFunctions.portableHash(
          concat(col("doc_id").cast("string"), lit("|"), col("source"))),
          lit(100L)).as("bucket"))
      .where(col("bucket") < pct)
      .orderBy("doc_id")

  /** Oracle SQL twin of [[sampleDocs]]. */
  def sampleDocsOracle(pct: Int = 10): String = {
    val h = TextFunctions.portableHashSql(
      "concat(CAST(doc_id AS VARCHAR), '|', source)")
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
    val h = TextFunctions.portableHash(
      concat(col("doc_id").cast("string"), lit("|"), col("source")))
    docs.select(col("doc_id"), col("source"), h.as("hk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id")))
        .cast("long"))
      .where(col("rk") <= quota)
      .orderBy("source", "rk")
  }

  /** Oracle SQL twin of [[quotaSample]]. */
  def quotaSampleOracle(quota: Int = 10): String = {
    val h = TextFunctions.portableHashSql(
      "concat(CAST(doc_id AS VARCHAR), '|', source)")
    s"""SELECT doc_id, source, hk, rk FROM (
       |  SELECT doc_id, source, $h AS hk,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY $h, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= $quota ORDER BY source, rk""".stripMargin
  }
}
