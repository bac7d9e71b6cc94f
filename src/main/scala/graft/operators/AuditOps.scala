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

  /** Corpus snapshot diff — the dataset-versioning audit run between
    * two releases of the same corpus: per (source, status) counts of
    * added / removed / changed / unchanged documents, keyed by doc_id
    * with content compared BY HASH. Only (id, source, 32-byte md5)
    * rides the full-outer shuffle — never the text — so the diff costs
    * two key-partitioned scans regardless of document size. This is
    * the "what actually changed between v1 and v2?" gate a training
    * run checks before re-ingesting a refreshed crawl.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), col("source").as("src1"),
      md5(col("text")).as("h1"))
    val b = v2.select(col("doc_id"), col("source").as("src2"),
      md5(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src1"), col("src2")).as("source"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  /** The deterministic "v2" used by q97 so the diff is oracle-checkable
    * from one input table: drop doc_id % 17 == 0 (removals), append
    * " v2" to text for doc_id % 13 == 0 (changes), and re-add
    * doc_id % 19 == 0 under shifted ids (additions).
    */
  def demoV2(docs: DataFrame): DataFrame =
    docs.where(pmod(col("doc_id"), lit(17L)) =!= 0L)
      .withColumn("text", when(pmod(col("doc_id"), lit(13L)) === 0L,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(docs.where(pmod(col("doc_id"), lit(19L)) === 0L)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))

  /** Oracle SQL twin of [[snapshotDiff]] over [[demoV2]]. */
  def snapshotDiffOracle: String =
    """WITH v2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000, source, text FROM documents
      |  WHERE doc_id % 19 = 0
      |), a AS (SELECT doc_id, source AS src1, md5(text) AS h1 FROM documents),
      |b AS (SELECT doc_id, source AS src2, md5(text) AS h2 FROM v2)
      |SELECT coalesce(src1, src2) AS source,
      |  CASE WHEN h1 IS NULL THEN 'added'
      |       WHEN h2 IS NULL THEN 'removed'
      |       WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS status,
      |  count(*) AS n_docs
      |FROM a FULL OUTER JOIN b USING (doc_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

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

  /** Benford first-digit audit — the classic fabricated-data screen:
    * the leading digit of each amount, counted against Benford's
    * log₁₀(1 + 1/d) expectation. The digit is extracted from the
    * STRING form of the exact cents integer (`substr(cast, 1, 1)`) —
    * no float log, so the histogram is engine-exact; the expected
    * shares are fixed literal doubles (identical in both engines by
    * construction). One map-side-combined 9-group rollup.
    */
  def benfordAudit(df: DataFrame, amountCol: String): DataFrame = {
    import graft.functions.DetAgg
    val expected = (1 to 9)
      .map(d => d -> math.rint(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6)
    val expectedCol = expected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, e)) =>
        when(col("digit") === d.toString, lit(e)).otherwise(acc)
    }
    val cnt = df
      .select(substring(
        expr(s"CAST(CAST(round($amountCol * 100) AS BIGINT) AS STRING)"),
        1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        DetAgg.ratio(col("n"), col("total"), 6).as("share"),
        expectedCol.as("benford"))
      .orderBy("digit")
  }

  /** Oracle SQL twin of [[benfordAudit]]. */
  def benfordAuditOracle(table: String, amountCol: String): String = {
    import graft.functions.DetAgg
    val expected = (1 to 9)
      .map(d => d -> math.rint(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6)
    val cases = expected
      .map { case (d, e) => s"WHEN digit = '$d' THEN $e" }
      .mkString(" ")
    s"""WITH c AS (
       |  SELECT substr(CAST(CAST(round($amountCol * 100) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS digit,
       |    count(*) AS n
       |  FROM $table GROUP BY 1
       |), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
       |SELECT digit, n, ${DetAgg.ratioSql("n", "total", 6)} AS share,
       |  CASE $cases ELSE NULL END AS benford
       |FROM c, t ORDER BY digit""".stripMargin
  }
}
