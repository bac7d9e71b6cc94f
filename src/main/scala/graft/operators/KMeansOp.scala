package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** K-means scoring (reference use case 3, M2/M3: nearest-center id +
  * centroid distance per point, `traffic/process/ClusterAnalyser.scala:40-45`).
  *
  * The centers are collected to the driver (k rows — always tiny) and
  * compiled into literal per-row expressions, so assignment is a pure
  * map over the scan: NO join, NO shuffle, embarrassingly parallel at
  * any scale. This is the plan a 1000-executor cluster wants — the
  * alternative (crossJoin + window argmin) shuffles k×N rows.
  *
  * Training (the reference's `StreamingKMeans.trainOn`) lives in
  * [[graft.streaming.IncrementalKMeans]]; this op is the scoring half.
  */
object KMeansOp {

  /** Assign each embedding to the nearest of the centers given by
    * `centerIds` (deterministic seed rows, stand-in for trained centers).
    * Distances rounded to 6dp before the argmin so cross-engine float
    * noise cannot flip the chosen center; ties break to the smallest
    * center id (centers evaluated in ascending-id order).
    */
  def assign(embeddings: DataFrame, centerIds: Seq[Long]): DataFrame = {
    val spark = embeddings.sparkSession
    val centers: Seq[(Long, Seq[Double])] = embeddings
      .filter(col("vec_id").isin(centerIds: _*))
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

    val v = toDoubleArray(col("embedding"))
    val dists: Seq[(Long, Column)] = centers.map { case (cid, cv) =>
      cid -> round(l2(v, array(cv.map(lit): _*)), 6)
    }
    val dcols = dists.zipWithIndex.map { case ((_, c), i) => c.as(s"d$i") }
    val withD = embeddings.select(col("vec_id") +: dcols: _*)
    val minD = least(dists.indices.map(i => col(s"d$i")): _*)
    val pred = dists.zipWithIndex.foldRight(lit(centers.last._1)) {
      case (((cid, _), i), elseCol) =>
        when(col(s"d$i") === minD, lit(cid)).otherwise(elseCol)
    }
    // foldRight builds when-chains in ascending-cid order: first match wins
    withD
      .select(col("vec_id"), pred.as("prediction"), minD.as("dist"))
      .orderBy("vec_id")
  }

  /** Per-label embedding centroids — the class-prototype / quantizer-
    * training vector aggregate (the batch form of what
    * [[graft.streaming.IncrementalKMeans]] does per step). Long-format
    * output (label, dim, n, c): one row per (label, dimension).
    *
    * Scale shape: `posexplode` emits NARROW (label, dim, q) rows that
    * partial-aggregate map-side, so the shuffle carries only
    * |labels|×dims rows per partition — never whole vectors through a
    * fat-row shuffle, and no driver-side vector math.
    *
    * Parity: values are fixed-point quantized with `floor(v·10⁶)` —
    * floor of the SAME IEEE double is binary-exact in every engine
    * (round() is not: Spark rounds the shortest decimal repr, DuckDB
    * the binary value) — then summed exactly as longs and divided
    * half-up in integer arithmetic ([[graft.functions.DetAgg]]).
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"),
        posexplode(toDoubleArray(col("embedding"))).as(Seq("dim", "v")))
      .withColumn("q", floor(col("v") * 1000000L).cast("long"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        (graft.functions.DetAgg.halfUpDiv(col("sq"), col("n")).cast("double")
          / 1000000.0).as("c"))
      .orderBy("label", "dim")

  def labelCentroidsOracle(dims: Int = 64): String =
    s"""SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n,
       |  CAST(${graft.functions.DetAgg.halfUpDivSql("sum(q)", "count(*)")}
       |    AS DOUBLE) / 1000000.0 AS c
       |FROM (
       |  SELECT e.label, d.d AS dim,
       |    CAST(floor(e.embedding[d.d + 1]::DOUBLE * 1000000) AS BIGINT) AS q
       |  FROM embeddings e, range($dims) d(d)
       |) t
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Simplified (centroid-based) silhouette per cluster — the standard
    * clustering-quality audit next to the assignment op: for each point,
    * a = distance to its own (nearest) centroid, b = distance to the
    * nearest OTHER centroid, s = (b−a)/b ∈ [0,1] (b ≥ a by
    * construction, so max(a,b) = b; b = 0 ⇒ s := 0). Unlike the full
    * silhouette's O(N²) point-to-point means, the centroid form is one
    * literal-centers map over the scan — no join, no extra shuffle
    * beyond the final k-row aggregate — so it runs at any corpus scale.
    *
    * Parity: distances are the same round(·, 6) values the assignment
    * op uses; s is floored to ppm BEFORE aggregation, so the per-cluster
    * mean is an exact integer mean ([[graft.functions.DetAgg]]) — no
    * float aggregation anywhere. The second-smallest distance is
    * `least` over all pairwise `greatest` (exact identity, tie-safe).
    */
  def silhouette(embeddings: DataFrame, centerIds: Seq[Long]): DataFrame = {
    val centers: Seq[(Long, Seq[Double])] = embeddings
      .filter(col("vec_id").isin(centerIds: _*))
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    require(centers.size >= 2, "silhouette needs at least 2 centers")
    val v = toDoubleArray(col("embedding"))
    val dists: Seq[(Long, Column)] = centers.map { case (cid, cv) =>
      cid -> round(l2(v, array(cv.map(lit): _*)), 6)
    }
    val dcols = dists.zipWithIndex.map { case ((_, c), i) => c.as(s"d$i") }
    val withD = embeddings.select(col("vec_id") +: dcols: _*)
    val ds = dists.indices.map(i => col(s"d$i"))
    val a = least(ds: _*)
    val pairMax = ds.combinations(2).map(p => greatest(p: _*)).toSeq
    val b = if (pairMax.size == 1) pairMax.head else least(pairMax: _*)
    val pred = dists.zipWithIndex.foldRight(lit(centers.last._1)) {
      case (((cid, _), i), elseCol) =>
        when(col(s"d$i") === a, lit(cid)).otherwise(elseCol)
    }
    val sPpm = when(b > 0.0,
      floor((b - a) / b * lit(1000000.0) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    withD
      .select(pred.as("prediction"), sPpm.as("sp"))
      .groupBy("prediction")
      .agg(count(lit(1)).as("n"),
        graft.functions.DetAgg.halfUpDiv(sum(col("sp")), count(lit(1)))
          .as("mean_s_ppm"),
        min(col("sp")).as("min_s_ppm"),
        max(col("sp")).as("max_s_ppm"))
      .orderBy("prediction")
  }

  /** Oracle SQL twin of [[silhouette]] — same rounded distances as the
    * q16 oracle, argmin/second-min via the (dist, cid) rank. */
  def silhouetteOracle(centerIds: Seq[Long] = Seq(7L, 42L, 123L),
                       dims: Int = 64): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id IN (${centerIds.mkString(", ")})),
       |d AS (
       |  SELECT e.vec_id, c.cid,
       |    round(sqrt(sum((e.embedding[i.i+1]::DOUBLE - c.cv[i.i+1]::DOUBLE)
       |                 * (e.embedding[i.i+1]::DOUBLE - c.cv[i.i+1]::DOUBLE))), 6) AS dist
       |  FROM embeddings e, c, range($dims) i(i)
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT vec_id, cid, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM d
       |), p AS (
       |  SELECT vec_id,
       |    max(CASE WHEN rn = 1 THEN cid END) AS prediction,
       |    max(CASE WHEN rn = 1 THEN dist END) AS a,
       |    min(CASE WHEN rn > 1 THEN dist END) AS b
       |  FROM r GROUP BY 1
       |), s AS (
       |  SELECT prediction,
       |    CASE WHEN b > 0 THEN CAST(floor((b - a) / b * 1000000.0 + 0.5) AS BIGINT)
       |         ELSE 0 END AS sp
       |  FROM p
       |)
       |SELECT prediction, count(*) AS n,
       |  ${graft.functions.DetAgg.halfUpDivSql("sum(sp)", "count(*)")} AS mean_s_ppm,
       |  min(sp) AS min_s_ppm, max(sp) AS max_s_ppm
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** Full anomaly pipeline (reference ClusterAnalyser semantics):
    * assign → per-cluster IQR outlier flag on the centroid distance.
    */
  def anomalies(embeddings: DataFrame, centerIds: Seq[Long]): DataFrame = {
    // assignment feeds both the threshold build and the outlier filter —
    // persist so the 64-dim distance expressions evaluate once; the
    // outlier rows are materialized eagerly so the cache is released
    // before returning (bench/verify run 50+ queries per session)
    val assigned = assign(embeddings, centerIds).persist()
    try OutlierOp.outliers(assigned, "prediction", "dist")
      .select(col("vec_id"), col("prediction"), col("dist"))
      .orderBy("vec_id")
      .localCheckpoint()
    finally assigned.unpersist()
  }
}
