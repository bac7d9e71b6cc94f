package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search + embedding near-duplicate detection over the
  * `embeddings` table (north-star LLM-pipeline operators, SURVEY.md §7.6).
  *
  * Three tiers, by scale:
  *  - [[topK]]: brute-force exact top-k vs one query vector — the
  *    baseline. Query vector is compiled to a literal, so scoring is a
  *    pure map + TakeOrdered: no join, no shuffle of the scan.
  *  - [[nearDupLsh]]: sign-sketch (random-hyperplane) LSH bucketing —
  *    candidate pairs only within equal 8-bit sketches (~256× pair
  *    reduction), then exact cosine refine. The bucket join shuffles on
  *    the sketch key only.
  *  - [[nearDupBlocked]]: IVF-style coarse blocking (label = cell) AND
  *    sketch equality — the partition-local search pattern a 100 TB ANN
  *    pipeline uses after a coarse quantizer.
  *
  * All arithmetic is engine-portable (fixed fold order, integer
  * hyperplanes, x*x not pow) so the DuckDB oracles run the identical
  * algorithm — generated from the same constants by [[sketchCte]].
  */
object SimilarityOp {

  /** Exact brute-force top-k cosine neighbours of `queryId`. */
  def topK(embeddings: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val qv: Seq[Double] = embeddings
      .filter(col("vec_id") === queryId)
      .select(toDoubleArray(col("embedding")))
      .collect().head.getSeq[Double](0)
    val qlit = array(qv.map(lit): _*)
    embeddings
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosine(toDoubleArray(col("embedding")), qlit), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  private def withSketch(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      toDoubleArray(col("embedding")).as("v"),
      signSketch(toDoubleArray(col("embedding"))).as("sketch"))

  private def pairCos(a: DataFrame, b: DataFrame, joinKeys: Seq[String],
                      minCos: Double): DataFrame = {
    val l = a.select(joinKeys.map(col) :+ col("vec_id").as("ida") :+ col("v").as("va"): _*)
    val r = b.select(joinKeys.map(col) :+ col("vec_id").as("idb") :+ col("v").as("vb"): _*)
    l.join(r, joinKeys)
      .where(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        round(cosine(col("va"), col("vb")), 4).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
      .orderBy("ida", "idb")
  }

  /** LSH-bucketed near-dup: pairs sharing the 8-bit sign sketch, exact
    * cosine ≥ `minCos`.
    */
  def nearDupLsh(embeddings: DataFrame, minCos: Double = 0.2): DataFrame = {
    val s = withSketch(embeddings)
    pairCos(s, s, Seq("sketch"), minCos)
  }

  /** Coarse-cell (label) + sketch blocked near-dup — IVF-style. */
  def nearDupBlocked(embeddings: DataFrame, minCos: Double = 0.2): DataFrame = {
    val s = withSketch(embeddings)
    pairCos(s, s, Seq("label", "sketch"), minCos)
  }

  // ---- DuckDB oracle generators (same constants, same arithmetic) ----

  /** CTE computing (vec_id, label, sketch) — mirror of [[signSketch]]. */
  def sketchCte(bits: Int = 8, dims: Int = 64): String =
    s"""dots AS (
       |  SELECT e.vec_id, j.j,
       |    sum(e.embedding[d.d + 1]::DOUBLE * (((j.j*37 + d.d*101) % 13) - 6)) AS dot
       |  FROM embeddings e, range($bits) j(j), range($dims) d(d)
       |  GROUP BY 1, 2
       |), sk AS (
       |  SELECT d2.vec_id, e2.label,
       |    CAST(sum(CASE WHEN d2.dot > 0 THEN (1 << d2.j) ELSE 0 END) AS BIGINT) AS sketch,
       |    any_value(e2.embedding) AS emb
       |  FROM dots d2 JOIN embeddings e2 ON d2.vec_id = e2.vec_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  private def pairSql(joinCond: String, minCos: Double, dims: Int = 64): String =
    s"""WITH ${sketchCte()},
       |pc AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb,
       |    sum(a.emb[i.i+1]::DOUBLE * b.emb[i.i+1]::DOUBLE) AS dot,
       |    sum(a.emb[i.i+1]::DOUBLE * a.emb[i.i+1]::DOUBLE) AS na,
       |    sum(b.emb[i.i+1]::DOUBLE * b.emb[i.i+1]::DOUBLE) AS nb
       |  FROM sk a JOIN sk b ON $joinCond AND a.vec_id < b.vec_id, range($dims) i(i)
       |  GROUP BY 1, 2
       |)
       |SELECT ida, idb, cos_sim FROM (
       |  SELECT ida, idb, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM pc) t
       |WHERE cos_sim >= $minCos ORDER BY ida, idb""".stripMargin

  def nearDupLshOracle(minCos: Double = 0.2): String =
    pairSql("a.sketch = b.sketch", minCos)

  def nearDupBlockedOracle(minCos: Double = 0.2): String =
    pairSql("a.label = b.label AND a.sketch = b.sketch", minCos)
}
