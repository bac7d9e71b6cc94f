package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Supervised feature preparation over the star schema: decision-stump
  * feature ranking (Gini impurity reduction) and leak-free smoothed
  * target encoding. The label throughout is the finished-order flag
  * (`o_orderstatus = 'F'`) — binary, mid-range prevalence at every sf,
  * so impurities and rates stay away from the degenerate 0/1 edges.
  *
  * Parity stance: counts are exact integers; every impurity/rate is a
  * [[graft.functions.DetAgg]] half-up integer division in ppm. Products
  * that square a per-value count promote to DECIMAL(38,0)/HUGEINT
  * BEFORE multiplying (the cupedLift lesson) so a popular category
  * cannot silently wrap a Long.
  */
object FeatureOps {

  private def label: Column =
    when(col("o_orderstatus") === "F", 1L).otherwise(0L)

  /** Gini-gain feature ranking — "which single categorical feature
    * best splits finished from open orders?", the decision-stump
    * screen that orders candidate features before any model training.
    * Per feature: parent Gini impurity 2p(1−p), the n_v-weighted child
    * impurity after splitting on the feature, and the reduction
    * (gain). Child impurity rounds once per VALUE (each value's
    * impurity is an exact half-up ppm, then the weighted mean rounds
    * once more) — deterministic in both engines, error bounded by
    * |values|/n ppm.
    *
    * Scale shape: one fact scan feeds a `stack` explode to (feature,
    * value, label) triples — 3 narrow rows per order — then ONE
    * map-side-combined groupBy on (feature, value); every frame after
    * that is |values|-sized. The customer/nation lookups are standard
    * dim equi-joins the planner sizes (broadcast at dim scale). No
    * windows, no global sorts.
    */
  def giniGain(orders: DataFrame, customer: DataFrame,
               nation: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val joined = orders
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_nationkey"), col("c_mktsegment")), Seq("o_custkey"))
      .join(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_name")), Seq("c_nationkey"))
      .select(label.as("y"), col("o_orderpriority"),
        col("c_mktsegment"), col("n_name"))
    val pairs = joined.select(col("y"), expr(
      """stack(3,
        |  'o_orderpriority', o_orderpriority,
        |  'c_mktsegment', c_mktsegment,
        |  'n_name', n_name) AS (feature, value)""".stripMargin))
    val perValue = pairs.groupBy(col("feature"), col("value"))
      .agg(count(lit(1)).as("n_v"), sum(col("y")).as("pos_v"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // per-value impurity scaled by 1e6, rounded half-up once per value
    val tv = halfUpDiv(
      dec(col("pos_v")) * 2L * (col("n_v") - col("pos_v")) * 1000000L,
      dec(col("n_v")))
    perValue
      .select(col("feature"), col("n_v"), col("pos_v"), tv.as("t_v"))
      .groupBy(col("feature"))
      .agg(sum(col("n_v")).as("n"), sum(col("pos_v")).as("pos"),
        sum(col("t_v")).as("t_sum"),
        count(lit(1)).as("n_values"))
      .select(col("feature"), col("n"), col("pos"), col("n_values"),
        halfUpDiv(dec(col("pos")) * 2L * (col("n") - col("pos")) * 1000000L,
          dec(col("n")) * col("n")).as("parent_ppm"),
        halfUpDiv(col("t_sum"), col("n")).as("child_ppm"))
      .withColumn("gain_ppm", col("parent_ppm") - col("child_ppm"))
      .orderBy("feature")
  }

  /** Oracle SQL twin of [[giniGain]]. */
  def giniGainOracle: String = {
    import graft.functions.DetAgg.{halfUpDivHugeSql, halfUpDivSql}
    s"""WITH j AS (
       |  SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
       |    o.o_orderpriority, c.c_mktsegment, n.n_name
       |  FROM orders o
       |  JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation n ON n.n_nationkey = c.c_nationkey
       |), pairs AS (
       |  SELECT y, 'o_orderpriority' AS feature, o_orderpriority AS value FROM j
       |  UNION ALL
       |  SELECT y, 'c_mktsegment', c_mktsegment FROM j
       |  UNION ALL
       |  SELECT y, 'n_name', n_name FROM j
       |), pv AS (
       |  SELECT feature, value, CAST(count(*) AS BIGINT) AS n_v,
       |    CAST(sum(y) AS BIGINT) AS pos_v
       |  FROM pairs GROUP BY 1, 2
       |), tv AS (
       |  SELECT feature, n_v, pos_v,
       |    ${halfUpDivHugeSql(
             "CAST(pos_v AS HUGEINT) * 2 * (n_v - pos_v) * 1000000", "n_v")}
       |      AS t_v
       |  FROM pv
       |), f AS (
       |  SELECT feature, CAST(sum(n_v) AS BIGINT) AS n,
       |    CAST(sum(pos_v) AS BIGINT) AS pos,
       |    CAST(sum(t_v) AS BIGINT) AS t_sum,
       |    CAST(count(*) AS BIGINT) AS n_values
       |  FROM tv GROUP BY 1
       |)
       |SELECT feature, n, pos, n_values,
       |  ${halfUpDivHugeSql(
           "CAST(pos AS HUGEINT) * 2 * (n - pos) * 1000000",
           "CAST(n AS HUGEINT) * n")} AS parent_ppm,
       |  ${halfUpDivSql("t_sum", "n")} AS child_ppm,
       |  ${halfUpDivHugeSql(
           "CAST(pos AS HUGEINT) * 2 * (n - pos) * 1000000",
           "CAST(n AS HUGEINT) * n")}
       |    - ${halfUpDivSql("t_sum", "n")} AS gain_ppm
       |FROM f ORDER BY feature""".stripMargin
  }

  /** m-estimate smoothed target encoding of the customer market
    * segment — the leak-free categorical encoder: the encoding is fit
    * ONLY on the train split (portable-hash bucket of the order key,
    * the repo's standard content-hash split discipline) and reported
    * against each segment's raw validation rate, so shrinkage toward
    * the train prior is visible per category:
    * enc = (pos_v + m·prior)/(n_v + m), m = 20.
    *
    * Scale shape: the split predicate and label are row-local; one
    * (segment)-keyed conditional aggregate carries train AND val counts
    * in the same pass (no second scan, no join between splits); the
    * train prior is a 1-row broadcast. Output is |segments| rows.
    */
  def targetEncoding(orders: DataFrame, customer: DataFrame,
                     m: Long = 20L): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val isTrain = pmod(TextFunctions.portableHash(
      reverse(col("o_orderkey").cast("string"))), lit(100L)) < 90L
    val base = orders
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment")), Seq("o_custkey"))
      .select(col("c_mktsegment").as("segment"), label.as("y"),
        isTrain.cast("long").as("tr"))
    val prior = base.agg(
      halfUpDiv(sum(col("y") * col("tr")) * 1000000L,
        sum(col("tr"))).as("prior_ppm"))
    base.groupBy(col("segment"))
      .agg(sum(col("tr")).as("n_train"),
        sum(col("y") * col("tr")).as("pos_train"),
        sum(lit(1L) - col("tr")).as("n_val"),
        sum(col("y") * (lit(1L) - col("tr"))).as("pos_val"))
      .crossJoin(broadcast(prior))
      .select(col("segment"), col("n_train"), col("pos_train"),
        col("n_val"), col("pos_val"), col("prior_ppm"),
        halfUpDiv(col("pos_train") * 1000000L + lit(m) * col("prior_ppm"),
          col("n_train") + lit(m)).as("enc_ppm"),
        when(col("n_val") > 0L,
          halfUpDiv(col("pos_val") * 1000000L, col("n_val")))
          .as("val_rate_ppm"))
      .orderBy("segment")
  }

  /** Oracle SQL twin of [[targetEncoding]]. */
  def targetEncodingOracle(m: Long = 20L): String = {
    import graft.functions.DetAgg.halfUpDivSql
    val h = TextFunctions.portableHashSql(
      "reverse(CAST(o_orderkey AS VARCHAR))")
    s"""WITH base AS (
       |  SELECT c.c_mktsegment AS segment,
       |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
       |    CASE WHEN ($h) % 100 < 90 THEN 1 ELSE 0 END AS tr
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |), prior AS (
       |  SELECT ${halfUpDivSql("sum(y * tr) * 1000000", "sum(tr)")}
       |    AS prior_ppm
       |  FROM base
       |), seg AS (
       |  SELECT segment,
       |    CAST(sum(tr) AS BIGINT) AS n_train,
       |    CAST(sum(y * tr) AS BIGINT) AS pos_train,
       |    CAST(sum(1 - tr) AS BIGINT) AS n_val,
       |    CAST(sum(y * (1 - tr)) AS BIGINT) AS pos_val
       |  FROM base GROUP BY 1
       |)
       |SELECT s.segment, s.n_train, s.pos_train, s.n_val, s.pos_val,
       |  p.prior_ppm,
       |  ${halfUpDivSql("s.pos_train * 1000000 + " + m + " * p.prior_ppm",
                         "s.n_train + " + m)} AS enc_ppm,
       |  CASE WHEN s.n_val > 0 THEN
       |    ${halfUpDivSql("s.pos_val * 1000000", "s.n_val")}
       |  END AS val_rate_ppm
       |FROM seg s, prior p ORDER BY s.segment""".stripMargin
  }
}
