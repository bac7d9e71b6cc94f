package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental mini-batch k-means with exponential decay — the
  * Structured-Streaming replacement for the reference's
  * `StreamingKMeans.trainOn` (`traffic/process/ClusterAnalyser.scala:15-33`;
  * SURVEY.md M1/§7.4). There is no DataFrame-native streaming k-means in
  * Spark, so the model state lives on the driver and is updated per
  * micro-batch from `foreachBatch`:
  *
  *   c' = (c · n · α + Σx) / (n · α + m),   n' = n · α + m
  *
  * (the public update rule from the Spark MLlib StreamingKMeans docs).
  * Per batch the heavy work — nearest-center assignment and per-center
  * per-dimension sums — is ONE distributed aggregate over the batch; only
  * k × dims numbers cross to the driver, so the design holds at any
  * batch size. Centers are compiled into literal expressions (no UDF, no
  * broadcast join).
  *
  * Initialization is deterministic (seeded hash), making training
  * reproducible for tests — the reference used random init.
  */
class IncrementalKMeans(val k: Int, val dims: Int,
                        val decay: Double = 1.0, val seed: Long = 42L) {

  private var centers: Array[Array[Double]] = Array.tabulate(k, dims) { (i, j) =>
    // deterministic pseudo-random init in [-1, 1)
    val h = (seed + i * 2654435761L + j * 40503L) % 1000003L
    (h.toDouble / 1000003.0) * 2.0 - 1.0
  }
  private var counts: Array[Double] = Array.fill(k)(0.0)

  def currentCenters: Array[Array[Double]] = centers.map(_.clone())
  def currentCounts: Array[Double] = counts.clone()

  private def l2sq(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)

  /** Nearest-center id for a vector column, against the CURRENT centers. */
  def predictCol(v: Column): Column = {
    val dcols = centers.map(c => l2sq(v, c))
    val minD = least(dcols: _*)
    dcols.zipWithIndex.foldRight(lit(k - 1)) { case ((d, i), other) =>
      when(d === minD, lit(i)).otherwise(other)
    }
  }

  /** One mini-batch update. `vecCol` must be array<double> of length
    * `dims`. Runs a single distributed aggregate; mutates driver state.
    */
  def update(batch: DataFrame, vecCol: String): Unit = {
    val v = col(vecCol)
    val agged = batch
      .select(predictCol(v).as("p"), v.as("v"))
      .groupBy(col("p"))
      .agg(count(lit(1)).cast("double").as("m"),
        (0 until dims).map(j => sum(element_at(col("v"), j + 1)).as(s"s$j")): _*)
      .collect()
    agged.foreach { row =>
      val p = row.getInt(0)
      val m = row.getDouble(1)
      if (m > 0) {
        val n = counts(p) * decay
        val denom = n + m
        var j = 0
        while (j < dims) {
          centers(p)(j) = (centers(p)(j) * n + row.getDouble(2 + j)) / denom
          j += 1
        }
        counts(p) = denom
      }
    }
    // decay counts of clusters that saw no data this batch
    val seen = agged.map(_.getInt(0)).toSet
    (0 until k).foreach(p => if (!seen.contains(p)) counts(p) *= decay)
  }

  /** Score a frame with the current model: prediction + distance. */
  def transform(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val dcols = centers.map(c => sqrt(l2sq(v, c)))
    val minD = least(dcols: _*)
    df.withColumn("prediction", predictCol(v)).withColumn("dist", minD)
  }
}
