package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: blocked fuzzy matching over short strings — the
  * record-linkage / typo-dedup sibling of DedupOp's document-level
  * near-dup stack (training-data pipelines run this over titles,
  * author names, URLs, product names).
  *
  * Scale design — the two standard ER levers, both explicit here:
  *
  *  - '''Block before comparing.''' Edit distance is quadratic per
  *    pair and can't be indexed, so candidate generation must be an
  *    equi-join on a cheap blocking key (here: the name's second
  *    token; real pipelines use phonetic codes or sorted-neighborhood
  *    keys). Comparisons per block are |block|², not |corpus|².
  *  - '''Compare canonical entities, not raw rows.''' Names are
  *    first aggregated to one row each (count + representative id),
  *    so a name occurring a million times costs ONE comparison, and
  *    the blocked self-join carries rows proportional to the distinct-
  *    name count, not the table size.
  */
object EntityOps {

  /** Within-block fuzzy name pairs: distinct part names, blocked on the
    * second token, paired at Levenshtein distance ≤ `maxDist` (strictly
    * ordered, so each unordered pair appears once). Emits the distance
    * plus each side's representative part key and occurrence count —
    * the input a survivor-selection pass (DedupOp.keepSet) consumes.
    */
  def fuzzyNamePairs(part: DataFrame, maxDist: Int = 4): DataFrame = {
    val names = part.groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("rep_id"))
      .withColumn("__blk", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("__blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"), col("rep_id").as("id_a"))
    val b = names.select(col("__blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"), col("rep_id").as("id_b"))
    a.join(b, Seq("__blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "id_a", "id_b", "n_a", "n_b")
      .orderBy("name_a", "name_b")
  }

  /** Oracle SQL twin of [[fuzzyNamePairs]] — DuckDB's levenshtein is
    * the same classic DP edit distance (integer, no tie ambiguity).
    */
  def fuzzyNamePairsOracle(maxDist: Int = 4): String =
    s"""WITH n AS (
       |  SELECT p_name, count(*) AS n_parts, min(p_partkey) AS rep_id,
       |    split_part(p_name, ' ', 2) AS blk
       |  FROM part GROUP BY 1
       |)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |  levenshtein(a.p_name, b.p_name) AS dist,
       |  a.rep_id AS id_a, b.rep_id AS id_b,
       |  a.n_parts AS n_a, b.n_parts AS n_b
       |FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) <= $maxDist
       |ORDER BY name_a, name_b""".stripMargin
}
