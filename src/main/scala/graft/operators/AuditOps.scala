package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audits an ingest pipeline runs BEFORE trusting a drop:
  * referential integrity across tables and per-column profiles. At
  * 100 TB these are the cheap early warnings that a partial load, a
  * schema drift, or an upstream id-space change happened — long before
  * a downstream join silently loses rows.
  */
object AuditOps {

  /** One child→parent key relation to audit. */
  final case class FkRel(name: String, child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String)

  /** Referential-integrity audit: for each declared relation, count the
    * child rows, NULL child keys, and orphans (non-null child keys with
    * no parent row). Healthy = zeros in the last two columns — and the
    * audit proves it rather than assuming it.
    *
    * Scale shape: each relation is an independent aggregate + LEFT ANTI
    * join against the parent's DISTINCT key set; dimension-sized
    * parents broadcast (planner-sized, no forced hint), and the one
    * fact-to-fact relation (lineitem→orders) shuffles on the join key
    * exactly once. Keys compare as BIGINT so INT dimension keys and
    * BIGINT fact keys audit as one id space.
    */
  def fkIntegrity(rels: Seq[FkRel]): DataFrame = {
    require(rels.nonEmpty, "fkIntegrity needs at least one relation")
    rels.map { r =>
      val keyed = r.child.select(col(r.childKey).cast("long").as("__k"))
      val parents = r.parent
        .select(col(r.parentKey).cast("long").as("__k")).distinct()
      val orphans = keyed.where(col("__k").isNotNull)
        .join(parents, Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      keyed.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_nulls"))
        .crossJoin(orphans)
        .select(lit(r.name).as("relation"),
          col("n_rows"), col("n_nulls"), col("n_orphans"))
    }.reduce(_ unionByName _).orderBy("relation")
  }

  /** The default relation set over the warehouse tables. */
  def defaultRels(s: SparkSession, d: String): Seq[FkRel] = {
    import graft.tables.Tables
    Seq(
      FkRel("customer.c_nationkey->nation.n_nationkey",
        Tables.customer(s, d), "c_nationkey", Tables.nation(s, d), "n_nationkey"),
      FkRel("events.user_id->customer.c_custkey",
        Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey"),
      FkRel("lineitem.l_orderkey->orders.o_orderkey",
        Tables.lineitem(s, d), "l_orderkey", Tables.orders(s, d), "o_orderkey"),
      FkRel("lineitem.l_partkey->part.p_partkey",
        Tables.lineitem(s, d), "l_partkey", Tables.part(s, d), "p_partkey"),
      FkRel("lineitem.l_suppkey->supplier.s_suppkey",
        Tables.lineitem(s, d), "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
      FkRel("nation.n_regionkey->region.r_regionkey",
        Tables.nation(s, d), "n_regionkey", Tables.region(s, d), "r_regionkey"),
      FkRel("orders.o_custkey->customer.c_custkey",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"),
      FkRel("supplier.s_nationkey->nation.n_nationkey",
        Tables.supplier(s, d), "s_nationkey", Tables.nation(s, d), "n_nationkey"))
  }

  /** Oracle SQL twin of [[fkIntegrity]] over [[defaultRels]]: one
    * scalar-subquery row per relation (conservative DuckDB — no
    * correlated CASE aggregates).
    */
  def fkIntegrityOracle: String = {
    val rels = Seq(
      ("customer.c_nationkey->nation.n_nationkey",
        "customer", "c_nationkey", "nation", "n_nationkey"),
      ("events.user_id->customer.c_custkey",
        "events", "user_id", "customer", "c_custkey"),
      ("lineitem.l_orderkey->orders.o_orderkey",
        "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part.p_partkey",
        "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier.s_suppkey",
        "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation.n_regionkey->region.r_regionkey",
        "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders.o_custkey->customer.c_custkey",
        "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.s_nationkey->nation.n_nationkey",
        "supplier", "s_nationkey", "nation", "n_nationkey"))
    rels.map { case (name, ct, ck, pt, pk) =>
      s"""SELECT '$name' AS relation,
         |  (SELECT count(*) FROM $ct) AS n_rows,
         |  (SELECT count(*) FROM $ct WHERE $ck IS NULL) AS n_nulls,
         |  (SELECT count(*) FROM $ct c WHERE c.$ck IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $pt p WHERE CAST(p.$pk AS BIGINT) = CAST(c.$ck AS BIGINT))) AS n_orphans""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** Per-column ingest profile: row count, NULL count, and EXACT
    * distinct count for each named column — the drop-level "did the
    * load change shape?" check (a distinct-count cliff on an id column
    * means a partial load; a NULL spike means schema drift).
    *
    * One pass: Spark plans the k exact count(DISTINCT)s as a single
    * Expand (×(k+1) row multiplier) — exact is the point here, since
    * the oracle gate hashes values. At 100 TB swap exact distincts for
    * `approx_count_distinct` (HLL, one pass, no Expand) and keep this
    * form for drops small enough to afford exactness.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__nulls_$c"),
      count_distinct(col(c)).as(s"__dist_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"),
        col("p.n_nulls"), col("p.n_distinct"))
      .orderBy("col_name")
  }

  /** Oracle SQL twin of [[columnProfile]] for `table`'s `cols`. */
  def columnProfileOracle(table: String, cols: Seq[String]): String = {
    val aggs = cols.map(c =>
      s"""  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c,
         |  count(DISTINCT $c) AS dist_$c""".stripMargin).mkString(",\n")
    val arms = cols.map(c =>
      s"""SELECT '$c' AS col_name, n_rows, coalesce(nulls_$c, 0) AS n_nulls,
         |  dist_$c AS n_distinct FROM p""".stripMargin)
    s"""WITH p AS (SELECT count(*) AS n_rows,
       |$aggs
       |FROM $table)
       |${arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")}""".stripMargin
  }
}
