package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      // ONE pass per relation (r16 optimization): a LEFT join against
      // the distinct parent keys with a presence marker feeds a single
      // aggregate computing all three counts. The previous form ran
      // the child twice (a counts-only aggregate + a LEFT ANTI join
      // into a second aggregate, cross-joined back) — two full child
      // scans per relation, 16 for the 8-relation default set, where
      // one suffices. NULL child keys never match the join (SQL null
      // semantics), so they land in n_nulls and never in n_orphans —
      // identical values to the anti-join form (AuditSpec pins the
      // planted-orphan/NULL/INT-vs-BIGINT cases).
      val keyed = r.child.select(col(r.childKey).cast("long").as("__k"))
      val parents = r.parent
        .select(col(r.parentKey).cast("long").as("__k")).distinct()
        .withColumn("__p", lit(1L))
      keyed.join(parents, Seq("__k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_nulls"),
          coalesce(sum(when(col("__k").isNotNull && col("__p").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_orphans"))
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

  /** Pearson correlation screen between declared numeric features, per
    * (returnflag, linestatus) — the feature-drift audit a training
    * pipeline runs on tabular drops ("did quantity stop predicting
    * price?"). All five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are
    * EXACT BIGINTs over integer-coded features (quantity as-is, price
    * as whole currency units = cents div 100, discount as integer
    * percent), so both engines feed IDENTICAL integers into an
    * IDENTICAL scalar double expression — and every operator in that
    * expression (·, −, /, sqrt, floor) is IEEE-correctly-rounded, so
    * the fixed-point ppm output is bit-equal cross-engine with no
    * float-SUM fold-order hazard anywhere (the q109 lesson: only
    * AGGREGATION over floats leaks order; scalar float math does not).
    *
    * Scale shape: one map-side-combined groupBy carrying eight integer
    * sums — a single shuffle of ~6 tiny rows. At SF where Σy² nears
    * 2^63 (≈ sf5 for whole-dollar units), promote the moment sums to
    * DECIMAL(38,0); the downstream double math is unchanged.
    */
  def featureCorr(lineitem: DataFrame): DataFrame = {
    import graft.functions.DetAgg.corrPpm
    val qty = col("l_quantity").cast("long")
    val dol = call_function("div",
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)"), lit(100L))
    val dsc = expr("CAST(round(l_discount * 100) AS BIGINT)")
    lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(qty).as("sx"), sum(dol).as("sy"), sum(dsc).as("sz"),
        sum(qty * qty).as("sxx"), sum(dol * dol).as("syy"),
        sum(dsc * dsc).as("szz"),
        sum(qty * dol).as("sxy"), sum(qty * dsc).as("sxz"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        corrPpm(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")).as("corr_qty_price_ppm"),
        corrPpm(col("n"), col("sx"), col("sz"),
          col("sxx"), col("szz"), col("sxz")).as("corr_qty_disc_ppm"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Oracle SQL twin of [[featureCorr]] — same exact integer moments,
    * same scalar double expression, operator for operator.
    */
  def featureCorrOracle: String = {
    def corr(sx: String, sy: String, sxx: String, syy: String,
             sxy: String): String =
      graft.functions.DetAgg.corrPpmSql("n", sx, sy, sxx, syy, sxy)
    s"""WITH m AS (
       |  SELECT l_returnflag, l_linestatus, count(*) AS n,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
       |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) // 100)
       |      AS BIGINT) AS sy,
       |    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sz,
       |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
       |      AS BIGINT) AS sxx,
       |    CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT) // 100) *
       |             (CAST(round(l_extendedprice * 100) AS BIGINT) // 100))
       |      AS BIGINT) AS syy,
       |    CAST(sum(CAST(round(l_discount * 100) AS BIGINT) *
       |             CAST(round(l_discount * 100) AS BIGINT))
       |      AS BIGINT) AS szz,
       |    CAST(sum(CAST(l_quantity AS BIGINT) *
       |             (CAST(round(l_extendedprice * 100) AS BIGINT) // 100))
       |      AS BIGINT) AS sxy,
       |    CAST(sum(CAST(l_quantity AS BIGINT) *
       |             CAST(round(l_discount * 100) AS BIGINT))
       |      AS BIGINT) AS sxz
       |  FROM lineitem GROUP BY 1, 2
       |)
       |SELECT l_returnflag, l_linestatus, n,
       |  ${corr("sx", "sy", "sxx", "syy", "sxy")} AS corr_qty_price_ppm,
       |  ${corr("sx", "sz", "sxx", "szz", "sxz")} AS corr_qty_disc_ppm
       |FROM m ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Spearman rank correlation (quantity vs price cents per return
    * flag) — the rank-robust sibling of [[featureCorr]]: monotone but
    * non-linear association that Pearson understates shows up here.
    *
    * Ranks are AVERAGE ranks (the tie-correct Spearman definition) in
    * doubled form so they stay integral under ties: 2·r̄ = 2·rank +
    * tiecount − 1, from in-partition window passes after ONE shuffle on
    * the group key — a rank statistic inherently sorts within its
    * group, and this plan sorts narrow (grp, x, y) triples exactly
    * that once per variable. Pearson is affine-invariant, so ρ on 2·r̄
    * IS ρ on r̄.
    *
    * Parity: the moment sums over integer doubled ranks are exact
    * integers fed into [[graft.functions.DetAgg.corrPpm]]'s scalar
    * double kernel — bit-equal cross-engine. The sums accumulate in
    * DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB (the old
    * BIGINT sums hit 2⁶³ on Σ(2r̄)² ≈ (4/3)n³ near n ≈ 1.9×10⁶ rows
    * per group ≈ sf1), so the binding bound is now the per-ROW product
    * (2r̄)² ≤ 4n² < 2⁶³ at n ≈ 1.5×10⁹ rows PER GROUP (≈ sf250 for the
    * biggest return-flag group; ANSI throws loudly past it). Both
    * engines convert the identical integer to double with one
    * round-to-nearest, so the kernel stays bit-equal even past 2⁵³
    * (AuditSpec property-checks the decimal path at the old bound).
    *
    * The promotion is COUNT-GATED ([[SpearmanBigintMaxRows]]): one
    * `count()` ACTION on the input — a real Spark job, run eagerly at
    * DataFrame-CONSTRUCTION time, so the branch is baked into the
    * returned plan — picks BIGINT moment sums when even the
    * all-rows-in-one-group worst case Σ(2r̄)² ≤ 4n³ stays under 2⁶³,
    * DECIMAL(38,0) above (the StatTestOps.mannWhitney tie-term
    * convention). If the input grows between construction and a later
    * execution (not possible with this repo's immutable parquet
    * inputs, but possible for an arbitrary caller's frame), the stale
    * gate cannot silently wrap: the BIGINT branch re-checks the
    * per-group row count — the quantity the 4n³ bound is actually a
    * function of — at EXECUTION time and `raise_error`s past it. The
    * guard feeds the output column, so Catalyst cannot prune it.
    * Parity is branch-free on the oracle side — DuckDB's sum(BIGINT)
    * is always HUGEINT-exact — so the branch only has to produce the
    * same exact integers, which AuditSpec asserts by running both
    * branches on one frame. Recovered ~1 s of decimal aggregation at
    * sf0.1 (3.5 → 2.5 s steady).
    */
  val SpearmanBigintMaxRows: Long = 1L << 20 // 4n³ < 2⁶³ ⇔ n < 2^20.33

  def spearman(lineitem: DataFrame,
               bigintMaxRows: Long = SpearmanBigintMaxRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.corrPpm
    val base = lineitem.select(col("l_returnflag").as("grp"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
    // ASYMMETRIC rank construction, shaped to each variable's
    // cardinality (A/B'd at sf0.1; the symmetric forms both lose):
    //  - y (price cents, ~all-distinct): 2·r̄ = 2·rank + tiecount − 1
    //    from window passes over one hash-by-grp exchange —
    //    histogram+join-back here re-shuffles an all-distinct frame
    //    (measured 3.1 s vs 2.0 s in the round-8 A/B);
    //  - x (quantity, a bounded integral domain — ≤ 50 distinct
    //    values per group): the histogram cumulative the ORACLE uses,
    //    2·r̄ = 2·Σcnt(≤x) − cnt + 1 over the |grp|×|domain|-row
    //    histogram, broadcast-joined back. This deletes the second
    //    full (grp, x) sort pass, whose parallelism is |groups| = 3 —
    //    the q164 bottleneck (2.75 → ~2.0 s steady at sf0.1). The
    //    broadcast hint is safe BY the domain bound; a wide-domain x
    //    would move back to the window form.
    def rank2(c: String): Column =
      rank().over(Window.partitionBy(col("grp")).orderBy(col(c)))
        .cast("long") * 2L +
        count(lit(1)).over(Window.partitionBy(col("grp"), col(c))) - 1L
    val rx = base.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("grp"), col("x"),
        (sum(col("cnt")).over(Window.partitionBy(col("grp"))
          .orderBy(col("x"))) * 2L - col("cnt") + 1L).as("rx"))
    val wide = lineitem.count() > bigintMaxRows
    def mom(c: Column): Column =
      sum(if (wide) c.cast("decimal(38,0)") else c)
    base
      .join(broadcast(rx), Seq("grp", "x"))
      .select(col("grp"), col("rx"), rank2("y").as("ry"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        mom(col("rx")).as("sx"),
        mom(col("ry")).as("sy"),
        mom(col("rx") * col("rx")).as("sxx"),
        mom(col("ry") * col("ry")).as("syy"),
        mom(col("rx") * col("ry")).as("sxy"))
      .select(col("grp").as("l_returnflag"), col("n"), {
        val rho = corrPpm(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy"))
        (if (wide) rho
         else when(col("n") > bigintMaxRows, raise_error(concat(
             lit(s"spearman: BIGINT moment sums gated at <= " +
               s"$bigintMaxRows rows at plan time, but a group has "),
             col("n"), lit(" rows at execution — input grew; rebuild"))))
           .otherwise(rho)).as("rho_ppm")
      })
      .orderBy("l_returnflag")
  }

  /** Oracle SQL twin of [[spearman]] — same histogram-ranks
    * construction. The windowed cumulative has no peer rows (values
    * are distinct after the groupBy), so the default RANGE frame is
    * tie-safe in both engines.
    */
  def spearmanOracle: String =
    s"""WITH b AS (
       |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
       |  FROM lineitem
       |), hx AS (SELECT grp, x, count(*) AS cnt FROM b GROUP BY 1, 2),
       |rx AS (
       |  SELECT grp, x, CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY x) * 2
       |    - cnt + 1 AS BIGINT) AS rx
       |  FROM hx
       |), hy AS (SELECT grp, y, count(*) AS cnt FROM b GROUP BY 1, 2),
       |ry AS (
       |  SELECT grp, y, CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY y) * 2
       |    - cnt + 1 AS BIGINT) AS ry
       |  FROM hy
       |), j AS (
       |  SELECT b.grp, rx.rx, ry.ry
       |  FROM b
       |  JOIN rx ON b.grp = rx.grp AND b.x = rx.x
       |  JOIN ry ON b.grp = ry.grp AND b.y = ry.y
       |), m AS (
       |  SELECT grp, count(*) AS n,
       |    sum(rx) AS sx, sum(ry) AS sy,
       |    sum(rx * rx) AS sxx,
       |    sum(ry * ry) AS syy,
       |    sum(rx * ry) AS sxy
       |  FROM j GROUP BY 1
       |)
       |SELECT grp AS l_returnflag, n,
       |  ${graft.functions.DetAgg.corrPpmSql("n", "sx", "sy", "sxx", "syy", "sxy")} AS rho_ppm
       |FROM m ORDER BY l_returnflag""".stripMargin

  /** Join-key skew audit — the pre-flight "will this join survive a
    * 100× scale-up" diagnostic: per declared join-key column, the
    * distinct-key count, the heaviest key's share, the max/mean skew
    * ratio, and the salt factor a skewed shuffle would need (ceil of
    * heaviest-key rows over the average partition's rows at `parts`
    * partitions — 1 means "no salting needed"). A key whose share
    * grows with the data (a null-surrogate, a default id, a hot
    * celebrity key) is what turns a clean sort-merge join into one
    * straggler task at 100 TB; this audit is what catches it in CI
    * before the data gets there.
    *
    * Scale shape: one map-side-combined groupBy per audited column,
    * then a 1-row rollup each — the audit costs one scan per column
    * regardless of skew. All metrics are exact integers
    * ([[graft.functions.DetAgg]] ppm rules).
    */
  def joinKeySkew(rels: Seq[(String, DataFrame, String)],
                  parts: Int = 32): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val perRel = rels.map { case (name, df, key) =>
      df.select(col(key).cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_cnt"))
        .select(lit(name).as("rel"), col("n"), col("n_keys"),
          col("max_cnt"),
          halfUpDiv(col("max_cnt") * 1000000L, col("n")).as("top1_ppm"),
          halfUpDiv(col("max_cnt") * col("n_keys") * 1000000L, col("n"))
            .as("skew_ppm"),
          call_function("div",
            col("max_cnt") * parts.toLong + col("n") - 1L, col("n"))
            .as(s"salt_$parts"))
    }
    perRel.reduce(_.unionByName(_)).orderBy("rel")
  }

  /** The audited (table, key) set — ONE list both [[defaultSkewRels]]
    * and [[joinKeySkewOracle]] derive from, so the Spark and oracle
    * sides cannot drift.
    */
  private val skewKeys: Seq[(String, String)] = Seq(
    "events" -> "user_id",
    "lineitem" -> "l_orderkey",
    "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey",
    "orders" -> "o_custkey")

  /** Oracle SQL twin of [[joinKeySkew]] for the default audited set. */
  def joinKeySkewOracle(parts: Int = 32): String = {
    import graft.functions.DetAgg.halfUpDivSql
    def one(table: String, key: String): String =
      s"""SELECT '$table.$key' AS rel, n, n_keys, max_cnt,
         |  ${halfUpDivSql("max_cnt * 1000000", "n")} AS top1_ppm,
         |  ${halfUpDivSql("max_cnt * n_keys * 1000000", "n")} AS skew_ppm,
         |  (max_cnt * $parts + n - 1) // n AS salt_$parts
         |FROM (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_keys,
         |    CAST(max(cnt) AS BIGINT) AS max_cnt
         |  FROM (SELECT CAST($key AS BIGINT) AS k, count(*) AS cnt
         |        FROM $table GROUP BY 1) g
         |) s""".stripMargin
    skewKeys.map { case (t, k) => one(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY rel")
  }

  /** The default audited join-key set for [[joinKeySkew]]. */
  def defaultSkewRels(s: SparkSession, d: String)
      : Seq[(String, DataFrame, String)] = {
    import graft.tables.Tables
    val load: Map[String, (SparkSession, String) => DataFrame] = Map(
      "events" -> (Tables.events _), "lineitem" -> (Tables.lineitem _),
      "orders" -> (Tables.orders _))
    skewKeys.map { case (t, k) => (s"$t.$k", load(t)(s, d), k) }
  }

  private val benfordExpected: Seq[(Int, Double)] = (1 to 9)
    .map(d => d -> math.rint(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6)

  /** Benford χ² goodness-of-fit distance — [[benfordAudit]]'s one-row
    * verdict per amount column: χ² = Σ_d (n_d − N·e_d)²/(N·e_d) over
    * digits 1–9, with e_d the same fixed literal expectations. The
    * nine digit counts are EXACT conditional-sum integers gathered in
    * one aggregate row, and the χ² terms are then CHAINED
    * left-to-right in digit order as one scalar expression — never a
    * float SUM aggregate — so the fold order is part of the query text
    * and both engines compute the identical double. Output is
    * fixed-point (χ²·10⁶ floored) under the hash gate, with df = 8.
    *
    * Scale shape: one full-scan aggregate per audited column with nine
    * conditional counters — a map-side-combined single row; the χ²
    * arithmetic happens on that one row.
    */
  def benfordChi2(df: DataFrame, tableName: String,
                  amountCol: String): DataFrame = {
    val digit = substring(
      expr(s"CAST(CAST(round($amountCol * 100) AS BIGINT) AS STRING)"), 1, 1)
    val digitAggs = benfordExpected.map { case (d, _) =>
      coalesce(sum(when(col("digit") === d.toString, 1L).otherwise(0L)),
        lit(0L)).as(s"n$d")
    }
    val counts = df.select(digit.as("digit"))
      .agg(count(lit(1)).as("n"), digitAggs: _*)
    val chi2 = benfordExpected.map { case (d, e) =>
      val exp = col("n").cast("double") * lit(e)
      val diff = col(s"n$d").cast("double") - exp
      diff * diff / exp
    }.reduce(_ + _) // left fold in digit order — deterministic chain
    counts.select(lit(tableName).as("tbl"), col("n"),
      lit(8L).as("df"),
      floor(chi2 * lit(1000000.0) + lit(0.5)).cast("long").as("chi2_e6"))
  }

  /** Oracle SQL twin of [[benfordChi2]] for one table/column arm. */
  def benfordChi2Oracle(table: String, amountCol: String): String = {
    val counters = benfordExpected.map { case (d, _) =>
      s"""    coalesce(CAST(sum(CASE WHEN digit = '$d' THEN 1 ELSE 0 END)
         |      AS BIGINT), 0) AS n$d""".stripMargin
    }.mkString(",\n")
    val chi2 = benfordExpected.map { case (d, e) =>
      s"((CAST(n$d AS DOUBLE) - CAST(n AS DOUBLE) * $e) * " +
        s"(CAST(n$d AS DOUBLE) - CAST(n AS DOUBLE) * $e) / " +
        s"(CAST(n AS DOUBLE) * $e))"
    }.reduce((a, b) => s"($a + $b)")
    s"""SELECT '$table' AS tbl, n, CAST(8 AS BIGINT) AS df,
       |  CAST(floor($chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_e6
       |FROM (
       |  SELECT count(*) AS n,
       |$counters
       |  FROM (SELECT substr(CAST(CAST(round($amountCol * 100) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS digit FROM $table) s
       |) c""".stripMargin
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

  /** q152: categorical-independence audit — the r×c contingency test
    * between two warehouse dimensions (χ² plus Cramér's V), in the
    * q131 determinism discipline generalized to DATA-DEPENDENT cells:
    * with cell count O, row total R, column total C, grand total N,
    * each cell contributes the INTEGER `(O·N − R·C)² div (R·C)`
    * (≡ χ²cell·N in exact rationals), the contributions sum order-free
    * (integer addition is associative — the reason the per-cell floor
    * happens BEFORE the sum), and one final scale gives
    * `chi2_milli = S·1000 div N`. Structural zero cells are
    * materialized from the row×col grid — a groupBy alone would
    * silently drop them and understate χ². The only float ops are the
    * final `/`, `sqrt`, `floor` for Cramér's V (emitted as half-up e4
    * fixed point) — scalar, correctly rounded, parity-safe (the q130
    * rule); no float ever aggregates.
    *
    * Scale shape: ONE map-side-combined scan to (r×c)-sized cells;
    * everything after runs on that tiny frame (grid join, rollups) —
    * broadcast-sized regardless of fact-table size.
    */
  def contingencyChi2(df: DataFrame, rowCol: String,
                      colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("rk"), col(colCol).as("ck"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("rk")).agg(sum(col("o")).as("r"))
    val ct = cells.groupBy(col("ck")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("rk")).as("nr"),
      count_distinct(col("ck")).as("nc"))
    val grid = rt.crossJoin(ct)
      .join(cells, Seq("rk", "ck"), "left")
      .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(tot)
    val d = col("o") * col("n") - col("r") * col("c")
    val s = grid
      .select(call_function("div", d * d, col("r") * col("c")).as("q"),
        col("n"), col("nr"), col("nc"))
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("q")).as("s"))
    s.select(col("n"), col("nr"), col("nc"),
        ((col("nr") - 1L) * (col("nc") - 1L)).as("dof"),
        call_function("div", col("s") * 1000L, col("n")).as("chi2_milli"))
      .withColumn("cramers_v_e4",
        floor(sqrt(col("chi2_milli").cast("double") / 1000.0 /
          (col("n") * (least(col("nr"), col("nc")) - 1L)).cast("double"))
          * 10000.0 + 0.5).cast("long"))
  }

  /** Oracle SQL twin of [[contingencyChi2]] over
    * orders(o_orderpriority × o_orderstatus). */
  def contingencyChi2Oracle(table: String = "orders",
                            rowCol: String = "o_orderpriority",
                            colCol: String = "o_orderstatus"): String =
    s"""WITH cells AS (
       |  SELECT $rowCol AS rk, $colCol AS ck, count(*) AS o
       |  FROM $table GROUP BY 1, 2
       |), rt AS (SELECT rk, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       |ct AS (SELECT ck, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(o) AS BIGINT) AS n,
       |    count(DISTINCT rk) AS nr, count(DISTINCT ck) AS nc
       |  FROM cells
       |), grid AS (
       |  SELECT rt.r, ct.c, coalesce(cells.o, 0) AS o
       |  FROM rt CROSS JOIN ct
       |  LEFT JOIN cells ON cells.rk = rt.rk AND cells.ck = ct.ck
       |), s AS (
       |  SELECT n, nr, nc,
       |    CAST(sum(((o * n - r * c) * (o * n - r * c)) // (r * c))
       |      AS BIGINT) AS s
       |  FROM grid, tot GROUP BY 1, 2, 3
       |)
       |SELECT n, nr, nc, (nr - 1) * (nc - 1) AS dof,
       |  (s * 1000) // n AS chi2_milli,
       |  CAST(floor(sqrt(CAST((s * 1000) // n AS DOUBLE) / 1000.0 /
       |    CAST(n * (least(nr, nc) - 1) AS DOUBLE)) * 10000.0 + 0.5)
       |    AS BIGINT) AS cramers_v_e4
       |FROM s""".stripMargin

  /** Poisson(1) CDF in fixed 10⁻⁶ units — ⌊CDF(k)·10⁶⌋ for k = 0..6
    * (weight 7 past the last threshold). These LITERALS define the
    * resampling weight function of [[bootstrapCi]] on both engines, so
    * cross-engine parity never depends on either engine's `exp`.
    */
  private val PoisCdf1e6: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** q190: Poisson-bootstrap confidence interval for the mean order
    * price per priority class — the standard DISTRIBUTED bootstrap
    * (Poisson(1) approximates multinomial resampling without any
    * global draw): each of `b` resamples assigns every order a
    * deterministic pseudo-Poisson weight — the portable hash of the
    * reversed order key mixed through a per-resample affine universal
    * hash (the MinHash permutation scheme) — so the whole audit is one
    * scan × `b` weighted partial sums, embarrassingly parallel and
    * REPRODUCIBLE run-to-run (a seeded-RNG bootstrap is neither
    * cross-engine nor cross-partitioning stable).
    *
    * Per class: the point mean, the 2.5th/97.5th percentile of the
    * `b` resample means (exact 1-indexed order statistics at ranks
    * ⌈0.025·B⌉ / ⌈0.975·B⌉), and the bootstrap SE from exact integer
    * moments through the corrPpm-style scalar double kernel (IEEE
    * ·,−,/,sqrt are correctly rounded; only float AGGREGATION leaks
    * fold order). Resample means are integer CENTS — squared sums stay
    * ≲ 10¹⁷ at TPC-H price magnitudes, BIGINT-safe with 50× headroom
    * (ANSI throws loudly past it).
    *
    * Scale shape: the b-fold explode rides the map side and combines
    * into `groups × b` partial rows before the ONLY shuffle; the order
    * stats + moments then run on 64-row groups. At 100 TB this is the
    * textbook one-pass bootstrap: no per-resample scan, no driver
    * randomness, no skew (weights average 1 everywhere).
    */
  def bootstrapCi(orders: DataFrame, b: Int = 64): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    import graft.functions.TextFunctions.portableHash
    import org.apache.spark.sql.expressions.Window
    require(b >= 40, "bootstrapCi: need b >= 40 for 2.5/97.5 order stats")
    val base = orders.select(col("o_orderpriority").as("grp"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    // ONE string hash per order (reversed key — fastest-varying digits
    // inside the 8-char folded prefix, the docHash lesson), then the
    // MinHash-style per-resample affine mix u_b = (a_b·h + c_b) mod M:
    // 64 integer ops replace 64 string hashes per order. A/B'd at
    // sf0.1 RunOne x3: 3.7 s → 1.8 s steady. a_b·h < (10⁹+7)² ≈
    // 1.0×10¹⁸ keeps every intermediate BIGINT-safe on both engines.
    val M = 1000000007L
    val rep = base
      .withColumn("h",
        portableHash(reverse(col("o_orderkey").cast("string"))))
      .withColumn("b", explode(array((0 until b).map(i => lit(i.toLong)): _*)))
      .withColumn("u",
        (((lit(1234567L) + lit(2654435761L) * col("b")) % M * col("h")
          + (lit(987654321L) + lit(40503L) * col("b")) % M) % M) % 1000000L)
      .withColumn("w", PoisCdf1e6.tail.zipWithIndex
        .foldLeft(when(col("u") < PoisCdf1e6.head, 0L)) {
          case (acc, (thr, i)) => acc.when(col("u") < thr, (i + 1).toLong)
        }.otherwise(lit(PoisCdf1e6.size.toLong)))
    val means = rep.groupBy(col("grp"), col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("cents")).as("swc"))
      .where(col("sw") > 0L)
      .select(col("grp"), col("b"), halfUpDiv(col("swc"), col("sw")).as("mb"))
    val ranked = means
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("mb"), col("b"))))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val loIdx = call_function("div", col("nr") * 25L + 999L, lit(1000L))
    val hiIdx = call_function("div", col("nr") * 975L + 999L, lit(1000L))
    val boot = ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_resamples"),
        sum(col("mb")).as("s"), sum(col("mb") * col("mb")).as("q"),
        max(when(col("rn") === loIdx, col("mb"))).as("boot_lo_cents"),
        max(when(col("rn") === hiIdx, col("mb"))).as("boot_hi_cents"))
    val nd = col("n_resamples").cast("double")
    val sd = col("s").cast("double")
    val qd = col("q").cast("double")
    val point = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_orders"),
        halfUpDiv(sum(col("cents")), count(lit(1))).as("point_mean_cents"))
    point.join(boot, Seq("grp"))
      .select(col("grp").as("o_orderpriority"), col("n_orders"),
        col("point_mean_cents"), col("n_resamples"),
        col("boot_lo_cents"), col("boot_hi_cents"),
        when(col("n_resamples") > 1L,
          floor(sqrt((nd * qd - sd * sd) / (nd * (nd - lit(1.0)))) + 0.5)
            .cast("long")).as("boot_se_cents"))
      .orderBy("o_orderpriority")
  }

  /** Oracle SQL twin of [[bootstrapCi]] — same hash, same CDF
    * literals, same order-statistic ranks, same scalar double SE. */
  def bootstrapCiOracle(b: Int = 64): String = {
    import graft.functions.TextFunctions.portableHashSql
    val wCase = PoisCdf1e6.zipWithIndex
      .map { case (t, i) => s"WHEN u < $t THEN $i" }
      .mkString(" ")
    s"""WITH base AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
       |  FROM orders
       |), bs AS (SELECT CAST(bb AS BIGINT) AS b FROM range($b) t(bb)),
       |hs AS (
       |  SELECT grp, cents,
       |    (${portableHashSql("reverse(CAST(o_orderkey AS VARCHAR))")}) AS h
       |  FROM base
       |), rep AS (
       |  SELECT grp, cents, b,
       |    ((((1234567 + 2654435761 * b) % 1000000007) * h
       |      + (987654321 + 40503 * b) % 1000000007) % 1000000007)
       |      % 1000000 AS u
       |  FROM hs CROSS JOIN bs
       |), wt AS (
       |  SELECT grp, b, cents,
       |    CAST(CASE $wCase ELSE ${PoisCdf1e6.size} END AS BIGINT) AS w
       |  FROM rep
       |), means AS (
       |  SELECT grp, b,
       |    ${graft.functions.DetAgg.halfUpDivSql(
            "CAST(sum(w * cents) AS BIGINT)", "CAST(sum(w) AS BIGINT)")} AS mb
       |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0
       |), ranked AS (
       |  SELECT grp, mb,
       |    row_number() OVER (PARTITION BY grp ORDER BY mb, b) AS rn,
       |    count(*) OVER (PARTITION BY grp) AS nr
       |  FROM means
       |), boot AS (
       |  SELECT grp, count(*) AS n_resamples,
       |    CAST(sum(mb) AS BIGINT) AS s, CAST(sum(mb * mb) AS BIGINT) AS q,
       |    max(CASE WHEN rn = (nr * 25 + 999) // 1000 THEN mb END)
       |      AS boot_lo_cents,
       |    max(CASE WHEN rn = (nr * 975 + 999) // 1000 THEN mb END)
       |      AS boot_hi_cents
       |  FROM ranked GROUP BY 1
       |), pt AS (
       |  SELECT grp, count(*) AS n_orders,
       |    ${graft.functions.DetAgg.halfUpDivSql(
            "CAST(sum(cents) AS BIGINT)", "count(*)")} AS point_mean_cents
       |  FROM base GROUP BY 1
       |)
       |SELECT pt.grp AS o_orderpriority, pt.n_orders, pt.point_mean_cents,
       |  boot.n_resamples, boot.boot_lo_cents, boot.boot_hi_cents,
       |  CASE WHEN boot.n_resamples > 1 THEN
       |    CAST(floor(sqrt((CAST(boot.n_resamples AS DOUBLE) * CAST(boot.q AS DOUBLE)
       |      - CAST(boot.s AS DOUBLE) * CAST(boot.s AS DOUBLE))
       |      / (CAST(boot.n_resamples AS DOUBLE)
       |         * (CAST(boot.n_resamples AS DOUBLE) - 1.0))) + 0.5) AS BIGINT)
       |  END AS boot_se_cents
       |FROM pt JOIN boot ON boot.grp = pt.grp
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** Column-level change attribution between two corpus snapshots —
    * the drill-down [[snapshotDiff]]'s `changed` bucket needs: for
    * every column, how many ids present in BOTH versions differ on
    * that column (null-safe compare). A `text`-only drift means a
    * re-crawl; an `n_chars` drift WITHOUT a text drift means a broken
    * derived column — exactly the inconsistency [[demoV2]] plants (it
    * edits text but never recomputes n_chars).
    *
    * Scale shape: one inner key join; columns named in `wide` ride the
    * shuffle as 32-byte md5s, never as content (the [[snapshotDiff]]
    * rule). All per-column counts come from ONE aggregate pass over the
    * joined frame, exploded to a row per column at the end — the
    * [[columnProfile]] shape.
    */
  def columnDrift(v1: DataFrame, v2: DataFrame, cols: Seq[String],
                  wide: Set[String] = Set("text")): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    require(cols.nonEmpty, "columnDrift needs at least one column")
    def side(df: DataFrame, p: String) = df.select(col("doc_id") +:
      cols.map { c =>
        val v = if (wide(c)) md5(col(c).cast("string")) else col(c)
        v.as(s"${p}_$c")
      }: _*)
    val j = side(v1, "a").join(side(v2, "b"), Seq("doc_id"))
    // coalesce: snapshots sharing NO doc_ids make the join empty, so
    // the global agg emits one row with n = 0 and NULL sums — the
    // counts pin to 0 and the ratio guards the zero denominator
    // (NULL changed_ppm per column), mirroring the oracle's arms
    val aggs = count(lit(1)).as("__n") +: cols.map(c =>
      coalesce(sum(when(not(col(s"a_$c") <=> col(s"b_$c")), 1L)
        .otherwise(0L)), lit(0L)).as(s"__ch_$c"))
    j.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("__n").as("n_common"),
        col(s"__ch_$c").as("n_changed"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_common"), col("p.n_changed"),
        when(col("p.n_common") > 0L,
          halfUpDiv(col("p.n_changed") * 1000000L, col("p.n_common")))
          .as("changed_ppm"))
      .orderBy("col_name")
  }

  /** Oracle SQL twin of [[columnDrift]] over [[demoV2]]'s documents
    * snapshot (cols: lang, n_chars, source, text).
    */
  def columnDriftOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    val cols = Seq("lang" -> "l", "n_chars" -> "c", "source" -> "s",
      "text" -> "t")
    val arms = cols.map { case (c, a) =>
      s"""SELECT '$c' AS col_name, n_common, ch_$a AS n_changed FROM p"""
    }
    s"""WITH v2 AS (
       |  SELECT doc_id, lang, source, n_chars,
       |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
       |  FROM documents WHERE doc_id % 17 <> 0
       |  UNION ALL
       |  SELECT doc_id + 10000000, lang, source, n_chars, text
       |  FROM documents WHERE doc_id % 19 = 0
       |), j AS (
       |  SELECT d.lang AS l1, v.lang AS l2, d.n_chars AS c1, v.n_chars AS c2,
       |    d.source AS s1, v.source AS s2,
       |    md5(CAST(d.text AS VARCHAR)) AS t1,
       |    md5(CAST(v.text AS VARCHAR)) AS t2
       |  FROM documents d JOIN v2 v USING (doc_id)
       |), p AS (
       |  SELECT count(*) AS n_common,
       |    CAST(coalesce(sum(CASE WHEN l1 IS DISTINCT FROM l2
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ch_l,
       |    CAST(coalesce(sum(CASE WHEN c1 IS DISTINCT FROM c2
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ch_c,
       |    CAST(coalesce(sum(CASE WHEN s1 IS DISTINCT FROM s2
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ch_s,
       |    CAST(coalesce(sum(CASE WHEN t1 IS DISTINCT FROM t2
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ch_t
       |  FROM j
       |)
       |SELECT col_name, n_common, n_changed,
       |  CASE WHEN n_common > 0
       |    THEN ${halfUpDivSql("n_changed * 1000000", "n_common")}
       |  END AS changed_ppm
       |FROM (${arms.mkString(" UNION ALL ")})
       |ORDER BY col_name""".stripMargin
  }

  /** q234: cross-modality coverage — per source, how many documents
    * have an embedding row (shared id space: `vec_id` keys the vector
    * for `doc_id`). The alignment audit a multimodal corpus runs
    * before any text↔vector join: a source whose coverage quietly
    * drops is an upstream embedding-job failure, caught here before
    * the ANN tier silently under-retrieves it.
    *
    * Scale shape: the embedding side projects to its DISTINCT id
    * column only (nothing vector-shaped rides the join), one id-keyed
    * equi-join against documents, one per-source map-side-combined
    * rollup. At 100 TB both sides shuffle-partition on the shared id —
    * the same co-partitioning every enrichment join here uses.
    */
  def embeddingCoverage(documents: DataFrame,
                        embeddings: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val vecIds = embeddings.select(col("vec_id").as("doc_id")).distinct()
      .withColumn("__hasv", lit(1L))
    documents.select(col("doc_id"), col("source"))
      .join(vecIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__hasv")), lit(0L)).as("n_with_vec"))
      .select(col("source"), col("n_docs"), col("n_with_vec"),
        halfUpDiv(col("n_with_vec") * 1000000L, col("n_docs"))
          .as("coverage_ppm"))
      .orderBy("source")
  }

  /** Oracle SQL twin of [[embeddingCoverage]]. */
  def embeddingCoverageOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH v AS (SELECT DISTINCT vec_id FROM embeddings)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(coalesce(sum(CASE WHEN v.vec_id IS NOT NULL
       |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_vec,
       |  ${halfUpDivSql(
            "coalesce(sum(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) * 1000000",
            "count(*)")} AS coverage_ppm
       |FROM documents d LEFT JOIN v ON v.vec_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q235: re-sharding stability — when a corpus layout grows from `k`
    * to `k+1` shards, what fraction of keys MOVE? Modulo placement
    * (`id % k`) moves ~k/(k+1) of the corpus — a full rewrite;
    * rendezvous (highest-random-weight) hashing moves only the ~1/(k+1)
    * that the NEW shard wins, the minimal possible. Both schemes are
    * measured on the same keys and published side by side — the
    * integer-exact version of the consistent-hashing argument, measured
    * on this corpus instead of assumed. At 100 TB this is the
    * difference between a full-corpus rewrite and an incremental
    * rebalance on every capacity change.
    *
    * Per (key, shard) weight = the portable string hash of
    * `"s#" + reverse(id)` — the reversed id puts the high-entropy low
    * digits inside the hash's 8-char fold (exact for ids < 10⁷; wider
    * ids would need a wider fold, loudly visible here as weight
    * collisions). One generate of k+1 weight rows per key, one
    * groupBy: both placements fall out of the same pass — the k-shard
    * argmax simply ignores the candidate row of the new shard. Ties
    * (never observed; the rule is still total) break to the smaller
    * shard id on BOTH engines.
    */
  def reshardStability(documents: DataFrame, k: Int = 8): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    import graft.functions.TextFunctions.portableHash
    require(k >= 1, "reshardStability: k must be positive")
    val keys = documents.select(col("doc_id"))
    val cands = keys.select(col("doc_id"),
        explode(sequence(lit(0), lit(k))).as("s"))
      .select(col("doc_id"), col("s"),
        portableHash(concat(col("s").cast("string"), lit("#"),
          reverse(col("doc_id").cast("string")))).as("h"))
    // argmax weight, ties to the smaller shard id == min over
    // (-h, s) struct ordering; the k-shard placement ignores s = k
    val placed = cands.groupBy(col("doc_id"))
      .agg(
        min(struct((lit(0L) - col("h")).as("nh"), col("s").as("s")))
          .getField("s").as("shard_new"),
        min(when(col("s") < k,
          struct((lit(0L) - col("h")).as("nh"), col("s").as("s"))))
          .getField("s").as("shard_old"))
    val rendezvous = placed.agg(count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("shard_new") =!= col("shard_old"), 1L)
          .otherwise(0L)), lit(0L)).as("n_moved"))
      .select(lit("rendezvous").as("scheme"), col("n_keys"), col("n_moved"))
    val modulo = keys.agg(count(lit(1)).as("n_keys"),
        coalesce(sum(when(pmod(col("doc_id"), lit(k.toLong)) =!=
          pmod(col("doc_id"), lit(k.toLong + 1L)), 1L).otherwise(0L)),
          lit(0L)).as("n_moved"))
      .select(lit("mod").as("scheme"), col("n_keys"), col("n_moved"))
    modulo.unionByName(rendezvous)
      .select(col("scheme"), col("n_keys"), col("n_moved"),
        halfUpDiv(col("n_moved") * 1000000L, col("n_keys"))
          .as("moved_ppm"))
      .orderBy("scheme")
  }

  /** Oracle SQL twin of [[reshardStability]]. */
  def reshardStabilityOracle(k: Int = 8): String = {
    import graft.functions.DetAgg.halfUpDivSql
    import graft.functions.TextFunctions.portableHashSql
    val h = portableHashSql(
      "CAST(s AS VARCHAR) || '#' || reverse(CAST(doc_id AS VARCHAR))")
    s"""WITH cands AS (
       |  SELECT doc_id, s, $h AS h
       |  FROM documents, range(${k + 1}) r(s)
       |), placed AS (
       |  SELECT doc_id,
       |    min(CASE WHEN rn = 1 THEN s END) AS shard_new,
       |    min(CASE WHEN rno = 1 THEN s END) AS shard_old
       |  FROM (
       |    SELECT doc_id, s,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY h DESC, s) AS rn,
       |      CASE WHEN s < $k THEN row_number() OVER (
       |        PARTITION BY doc_id, (s < $k)
       |        ORDER BY h DESC, s) END AS rno
       |    FROM cands) t
       |  GROUP BY 1
       |), arms AS (
       |  SELECT 'mod' AS scheme, count(*) AS n_keys,
       |    CAST(coalesce(sum(CASE WHEN doc_id % $k <> doc_id % ${k + 1}
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_moved
       |  FROM documents
       |  UNION ALL
       |  SELECT 'rendezvous', count(*),
       |    CAST(coalesce(sum(CASE WHEN shard_new <> shard_old
       |      THEN 1 ELSE 0 END), 0) AS BIGINT)
       |  FROM placed
       |)
       |SELECT scheme, n_keys, n_moved,
       |  ${halfUpDivSql("n_moved * 1000000", "n_keys")} AS moved_ppm
       |FROM arms ORDER BY scheme""".stripMargin
  }

  /** q237: Kendall τ-b (quantity vs price cents per return flag) on a
    * DETERMINISTIC bottom-k-by-hash sample — the concordance-based
    * third member of the correlation family (Pearson q130 / Spearman
    * q164 / Kendall here): τ counts pairwise order agreements, so it
    * reads association strength directly as a probability and is the
    * standard agreement statistic for comparing rankers. Exact τ is
    * inherently O(n²)-pair (or a merge-sort inversion count that
    * serializes each group), so the operator computes τ EXACTLY ON A
    * SAMPLE whose membership is a pure function of the portable hash —
    * the q158 sampling stance: the hash is the PRNG, both engines
    * re-derive the identical k rows per group, and the whole statistic
    * hash-gates with no error bound.
    *
    * Scale shape: the sample is drawn by the MERGEABLE bottom-k
    * sketch ([[graft.functions.BottomKAgg]], the q158 sampler) — every
    * map-side partial is bounded at k rows, so selection shuffles
    * k·|partitions| rows per group where the previous rank-window form
    * sorted the ENTIRE fact table through |groups| tasks (the suite's
    * last full-sort sampler; bottom-k of a union being bottom-k of
    * per-part bottom-k's makes the two constructions pick the
    * identical k rows). The (x, y) pair rides the sampler's one
    * double payload packed as y·64 + x — exact while x < 64 (TPC-H
    * quantity is 1..50) and y < 2⁴⁶ cents, both loudly `raise_error`
    * gated per row, unpacked exactly (y < 2⁴⁶ ≪ 2⁵³ and x/64 is a
    * power-of-two fraction). The pair expansion runs on k·|groups|
    * rows — bounded at k=128 to 8 128 pairs per group regardless of
    * corpus size. Category counts are exact integers; τ-b's
    * tie-corrected denominator √((nc+nd+t_y)(nc+nd+t_x)) is one scalar
    * IEEE expression on exact integers, embedded textually identically
    * in both engines (mult/div/sqrt/floor are correctly rounded — the
    * q130 rule). A group that is all-ties on either variable has no
    * defined τ and yields NULL on both engines.
    */
  def kendallTau(lineitem: DataFrame, k: Int = 128): DataFrame = {
    import graft.functions.TextFunctions.portableHash
    val id = (col("l_orderkey").cast("long") * 16L +
      col("l_linenumber").cast("long"))
    val base = lineitem.select(col("l_returnflag").as("grp"),
      id.as("id"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"),
      portableHash(reverse(id.cast("string"))).as("hx"))
    val packed = when(
      col("x").between(0L, 63L) && col("y").between(0L, 1L << 46),
      (col("y") * 64L + col("x")).cast("double"))
      .otherwise(raise_error(lit(
        "kendallTau: (x, y) outside the exact packing domain " +
          "[0,64)x[0,2^46) — widen the payload encoding")))
    val samp = base
      .groupBy(col("grp"))
      .agg(graft.functions.BottomKExpr.column(
        col("hx"), col("id"), packed, k).as("sample"))
      .select(col("grp"), explode(col("sample")).as("r"))
      .select(col("grp"), col("r").getField("id").as("id"),
        (col("r").getField("v") % 64d).cast("long").as("x"),
        floor(col("r").getField("v") / 64d).cast("long").as("y"))
    val a = samp.select(col("grp"), col("id").as("id1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = samp.select(col("grp"), col("id").as("id2"),
      col("x").as("x2"), col("y").as("y2"))
    val cats = a.join(b, Seq("grp"))
      .filter(col("id1") < col("id2"))
      .select(col("grp"),
        ((col("x2") - col("x1")) * (col("y2") - col("y1"))).as("p"),
        (col("x1") === col("x2")).as("tx"),
        (col("y1") === col("y2")).as("ty"))
    cats.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("p") > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("p") < 0, 1L).otherwise(0L)).as("nd"),
        sum(when(col("tx") && !col("ty"), 1L).otherwise(0L)).as("tox"),
        sum(when(col("ty") && !col("tx"), 1L).otherwise(0L)).as("toy"))
      .select(col("grp").as("l_returnflag"), col("n_pairs"),
        col("nc"), col("nd"),
        expr(kendallTauPpmSql("nc", "nd", "tox", "toy")).as("tau_ppm"))
      .orderBy("l_returnflag")
  }

  /** The shared τ-b scalar kernel — ONE expression string embedded in
    * both engines so the IEEE arithmetic is textually identical. */
  private def kendallTauPpmSql(nc: String, nd: String,
                               tox: String, toy: String): String =
    s"CASE WHEN ($nc + $nd + $toy) > 0 AND ($nc + $nd + $tox) > 0 THEN " +
      s"CAST(floor(($nc - $nd) * 1000000.0 / " +
      s"sqrt(CAST(($nc + $nd + $toy) AS DOUBLE) * ($nc + $nd + $tox)) " +
      s"+ 0.5) AS BIGINT) END"

  /** Oracle SQL twin of [[kendallTau]] — identical hash-derived
    * sample, identical category counts, identical scalar kernel. */
  def kendallTauOracle(k: Int = 128): String = {
    import graft.functions.TextFunctions.portableHashSql
    val idE = "(CAST(l_orderkey AS BIGINT) * 16 + l_linenumber)"
    val h = portableHashSql(s"reverse(CAST($idE AS VARCHAR))")
    s"""WITH base AS (
       |  SELECT l_returnflag AS grp, $idE AS id,
       |    CAST(l_quantity AS BIGINT) AS x,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
       |    $h AS hx
       |  FROM lineitem
       |), samp AS (
       |  SELECT grp, id, x, y FROM (
       |    SELECT grp, id, x, y,
       |      row_number() OVER (PARTITION BY grp ORDER BY hx, id) AS rk
       |    FROM base) t
       |  WHERE rk <= $k
       |), cats AS (
       |  SELECT a.grp,
       |    (b.x - a.x) * (b.y - a.y) AS p,
       |    (a.x = b.x) AS tx, (a.y = b.y) AS ty
       |  FROM samp a JOIN samp b ON a.grp = b.grp AND a.id < b.id
       |), m AS (
       |  SELECT grp, count(*) AS n_pairs,
       |    CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       |    CAST(sum(CASE WHEN p < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
       |    CAST(sum(CASE WHEN tx AND NOT ty THEN 1 ELSE 0 END) AS BIGINT)
       |      AS tox,
       |    CAST(sum(CASE WHEN ty AND NOT tx THEN 1 ELSE 0 END) AS BIGINT)
       |      AS toy
       |  FROM cats GROUP BY 1
       |)
       |SELECT grp AS l_returnflag, n_pairs, nc, nd,
       |  ${kendallTauPpmSql("nc", "nd", "tox", "toy")} AS tau_ppm
       |FROM m ORDER BY grp""".stripMargin
  }

  /** q236: exact two-sample Kolmogorov–Smirnov distance per language —
    * each language's doc-length distribution against the rest of the
    * corpus, the distribution-free drift test that catches a shifted
    * length profile χ² binning smooths over (one stratum of a corpus
    * suddenly shipping truncated or concatenated docs moves its whole
    * CDF, not any single bin). D = sup|F₁−F₂| is computed EXACTLY:
    * the sup is attained at an observed value, so
    * D·n₁·n₂ = max over distinct v of |cum₁(v)·n₂ − cum₂(v)·n₁| in
    * pure integers, published as ks_ppm = ⌊10⁶·D⌉.
    *
    * Scale shape: ONE groupBy collapses the corpus to the distinct
    * (lang, value) level; everything after — the lang×value grid, the
    * per-lang cumulative windows, the max — runs on that value-level
    * frame (the q169 stance: windows over distinct values, never over
    * rows). The |langs|-sized dimension broadcasts; cross-multiplied
    * CDF terms promote to DECIMAL(38,0)/HUGEINT, so the binding bound
    * is cum·n ≈ 10³⁸, far past any corpus. A lang that IS the whole
    * corpus has no complement; its ks_ppm is NULL on both engines.
    */
  def ksByLang(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.halfUpDiv
    val counts = documents.groupBy(col("lang"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.groupBy(col("v")).agg(sum(col("c")).as("tv"))
    val langs = counts.select(col("lang")).distinct()
    val perLang = counts.groupBy(col("lang")).agg(sum(col("c")).as("n1"))
    val nAll = tot.agg(sum(col("tv")).as("nn"))
    val grid = tot.crossJoin(broadcast(langs))
      .join(counts, Seq("lang", "v"), "left")
      .select(col("lang"), col("v"), col("tv"),
        coalesce(col("c"), lit(0L)).as("c1"))
    val w = Window.partitionBy(col("lang")).orderBy(col("v"))
    val cum = grid.select(col("lang"), col("v"),
      sum(col("c1")).over(w).as("f1"),
      sum(col("tv") - col("c1")).over(w).as("f2"))
    cum.join(broadcast(perLang), Seq("lang"))
      .crossJoin(broadcast(nAll))
      .withColumn("n2", col("nn") - col("n1"))
      .groupBy(col("lang"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("f1").cast("decimal(38,0)") * col("n2")
          - col("f2").cast("decimal(38,0)") * col("n1"))).as("dmax"))
      .select(col("lang"), col("n1"), col("n2"),
        when(col("n2") > 0,
          halfUpDiv(col("dmax") * lit(1000000L),
            col("n1").cast("decimal(38,0)") * col("n2")).cast("long"))
          .as("ks_ppm"))
      .orderBy("lang")
  }

  /** Oracle SQL twin of [[ksByLang]] — same distinct-value CDF grid,
    * HUGEINT cross-multiplication. */
  def ksByLangOracle: String = {
    import graft.functions.DetAgg.halfUpDivHugeSql
    s"""WITH c AS (
       |  SELECT lang, n_chars AS v, count(*) AS c
       |  FROM documents GROUP BY 1, 2
       |), t AS (SELECT v, CAST(sum(c) AS BIGINT) AS tv FROM c GROUP BY 1),
       |l AS (SELECT DISTINCT lang FROM c),
       |n1s AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n1 FROM c GROUP BY 1),
       |nn AS (SELECT CAST(sum(tv) AS BIGINT) AS nn FROM t),
       |g AS (
       |  SELECT l.lang, t.v, t.tv, coalesce(c.c, 0) AS c1
       |  FROM l CROSS JOIN t
       |  LEFT JOIN c ON c.lang = l.lang AND c.v = t.v
       |), cum AS (
       |  SELECT lang, v,
       |    CAST(sum(c1) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS f1,
       |    CAST(sum(tv - c1) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
       |      AS f2
       |  FROM g
       |), d AS (
       |  SELECT cum.lang, n1s.n1, nn.nn - n1s.n1 AS n2,
       |    max(abs(CAST(f1 AS HUGEINT) * (nn.nn - n1s.n1)
       |      - CAST(f2 AS HUGEINT) * n1s.n1)) AS dmax
       |  FROM cum
       |  JOIN n1s ON n1s.lang = cum.lang
       |  CROSS JOIN nn
       |  GROUP BY 1, 2, 3
       |)
       |SELECT lang, n1, n2,
       |  CASE WHEN n2 > 0 THEN ${halfUpDivHugeSql("dmax * 1000000",
            "CAST(n1 AS HUGEINT) * n2")} END AS ks_ppm
       |FROM d ORDER BY lang""".stripMargin
  }

  /** Dataset card — the one-frame corpus summary a dataset release
    * ships with (the "datasheet" practice), in long (metric, value)
    * format so new metrics append as rows, not schema changes: corpus
    * size, token mass, vocabulary, language/source breadth, exact
    * duplicate mass, length quantiles (exact index — the q07
    * convention), and the singleton-vocabulary share (the q265 N₁ in
    * card form). Everything is an exact integer; ratios are ppm.
    *
    * Scale shape: one token explode feeding two map-side-combined
    * aggregates (mass + vocab/count-of-counts), one md5 groupBy for
    * exact-dup mass, one sort-free exact quantile via the count-offset
    * join ([[graft.operators.OutlierOp]]'s index-quantile stance — the
    * n_chars histogram is grouped then offset-matched, no global
    * per-row sort), and a UNION of 1-row frames at the end (driver-
    * sized, the legal crossJoin class).
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    def row(metric: String, v: Column): DataFrame => DataFrame =
      df => df.select(lit(metric).as("metric"), v.cast("long").as("value"))
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text"))
    val simple = base.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("sum_chars"))
    val tok = base.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_singletons"))
    val dups = base
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("k"))
      .agg(sum(col("k") - 1L).as("n_exact_dup_docs"))
    // exact index quantiles of n_chars off the value histogram:
    // rank of the k-th smallest = ceil(q·n), matched by cumulative
    // count offsets — no per-row sort.
    val hist = base.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
    val cum = hist.select(col("n_chars"), col("c"),
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars"))).as("cum"))
    val n = base.agg(count(lit(1)).as("n"))
    def quant(q: Int): DataFrame = cum.crossJoin(broadcast(n))
      .where(col("cum") - col("c") < expr(s"CAST(($q * n + 99) DIV 100 AS BIGINT)") &&
        expr(s"CAST(($q * n + 99) DIV 100 AS BIGINT)") <= col("cum"))
      .select(col("n_chars"))
    val out = Seq(
      row("n_docs", col("n_docs"))(simple),
      row("n_langs", col("n_langs"))(simple),
      row("n_sources", col("n_sources"))(simple),
      row("sum_chars", col("sum_chars"))(simple),
      row("n_tokens", col("n_tokens"))(tok),
      row("vocab", col("vocab"))(tok),
      row("singleton_vocab_ppm",
        halfUpDiv(col("n_singletons") * 1000000L, col("vocab")))(tok),
      row("n_exact_dup_docs", col("n_exact_dup_docs"))(dups),
      row("p50_chars", col("n_chars"))(quant(50)),
      row("p90_chars", col("n_chars"))(quant(90)))
    out.reduce(_ unionByName _).orderBy("metric")
  }

  /** Oracle SQL twin of [[datasetCard]]. */
  def datasetCardOracle: String = {
    import graft.functions.DetAgg.halfUpDivSql
    def q(p: Int) =
      s"""SELECT n_chars FROM (
         |  SELECT n_chars, c, sum(c) OVER (ORDER BY n_chars) AS cum
         |  FROM (SELECT n_chars, count(*) AS c FROM documents GROUP BY 1)
         |) h, (SELECT count(*) AS n FROM documents) t
         |WHERE cum - c < ($p * n + 99) // 100 AND ($p * n + 99) // 100 <= cum""".stripMargin
    s"""WITH tok AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
       |  GROUP BY 1
       |), tk AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_singletons
       |  FROM tok
       |)
       |SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value
       |  FROM documents
       |UNION ALL SELECT 'n_langs', count(DISTINCT lang) FROM documents
       |UNION ALL SELECT 'n_sources', count(DISTINCT source) FROM documents
       |UNION ALL SELECT 'sum_chars', CAST(sum(n_chars) AS BIGINT)
       |  FROM documents
       |UNION ALL SELECT 'n_tokens', n_tokens FROM tk
       |UNION ALL SELECT 'vocab', vocab FROM tk
       |UNION ALL SELECT 'singleton_vocab_ppm',
       |  ${halfUpDivSql("n_singletons * 1000000", "vocab")} FROM tk
       |UNION ALL SELECT 'n_exact_dup_docs',
       |  CAST(sum(k - 1) AS BIGINT) FROM
       |  (SELECT md5(text) AS h, count(*) AS k FROM documents GROUP BY 1) d
       |UNION ALL SELECT 'p50_chars', CAST(n_chars AS BIGINT) FROM (${q(50)}) a
       |UNION ALL SELECT 'p90_chars', CAST(n_chars AS BIGINT) FROM (${q(90)}) b
       |ORDER BY metric""".stripMargin
  }

  /** k-anonymity audit over the customer quasi-identifier tuple
    * (nation, market segment, account-balance kilobucket) — the
    * privacy pre-flight for releasing or training on the table: the
    * equivalence-class SIZE HISTOGRAM (class_size → how many classes,
    * how many rows), with every size below `kThresh` flagged. Rows in
    * under-k classes are re-identifiable by their quasi-identifiers
    * alone; the histogram shape tells you whether to generalize
    * (coarser buckets) or suppress (drop the tail classes). The
    * balance bucket floors NEGATIVE balances correctly via the pmod
    * identity ([[EventOps]] floorDivMs discipline — TPC-H acctbal goes
    * to −999.99, and truncate-vs-floor would shift the whole debtor
    * class by one bucket in BOTH engines, hash-green but wrong).
    *
    * Scale shape: one map-side-combined groupBy to equivalence
    * classes (bounded by the QI-tuple cross product, not the row
    * count), then a count-of-counts rollup — the q94 vocab-coverage
    * shape. No windows, no sorts beyond the tiny histogram ORDER BY.
    */
  def kAnonymity(customer: DataFrame, kThresh: Long = 5L): DataFrame = {
    val bucket = expr(
      """CAST((CAST(round(c_acctbal * 100) AS BIGINT)
        | - pmod(CAST(round(c_acctbal * 100) AS BIGINT), 100000L))
        | DIV 100000L AS BIGINT)""".stripMargin)
    customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        bucket.as("bal_kb"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_kb"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        (count(lit(1)) * col("class_size")).as("n_rows"))
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        (col("class_size") < kThresh).cast("long").as("under_k"))
      .orderBy("class_size")
  }

  /** Oracle SQL twin of [[kAnonymity]]. */
  def kAnonymityOracle(kThresh: Long = 5L): String =
    s"""WITH b AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    (CAST(round(c_acctbal * 100) AS BIGINT)
       |      - ((CAST(round(c_acctbal * 100) AS BIGINT) % 100000
       |          + 100000) % 100000)) // 100000 AS bal_kb
       |  FROM customer
       |), ec AS (
       |  SELECT c_nationkey, c_mktsegment, bal_kb,
       |    CAST(count(*) AS BIGINT) AS class_size
       |  FROM b GROUP BY 1, 2, 3
       |)
       |SELECT class_size,
       |  CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(count(*) * class_size AS BIGINT) AS n_rows,
       |  CAST(CASE WHEN class_size < $kThresh THEN 1 ELSE 0 END AS BIGINT)
       |    AS under_k
       |FROM ec GROUP BY 1 ORDER BY 1""".stripMargin

  /** The (table, key column) manifest relations — ONE definition for
    * [[corpusManifest]] and its oracle. */
  private val ManifestKeys: Seq[(String, String)] = Seq(
    "customer" -> "c_custkey", "documents" -> "doc_id",
    "embeddings" -> "vec_id", "events" -> "event_id",
    "lineitem" -> "l_orderkey", "nation" -> "n_nationkey",
    "orders" -> "o_orderkey", "part" -> "p_partkey",
    "region" -> "r_regionkey", "supplier" -> "s_suppkey")

  /** q300: corpus manifest — one row per table with row count, NULL
    * key count, and distinct key count: the load-completeness
    * dashboard an ingest run publishes before anything downstream
    * trusts the snapshot. [[fkIntegrity]] checks relations BETWEEN
    * tables; this is the per-table half (a partial load shows up as
    * n_rows off; an id-space collision as n_distinct < n_rows on a
    * primary key; lineitem's n_distinct is its ORDER count by
    * design — the one declared non-unique key).
    *
    * Scale shape: one scan + one exact distinct per table —
    * embarrassingly parallel across tables, each map-side combined;
    * output is exactly |tables| rows.
    */
  def corpusManifest(s: SparkSession, d: String): DataFrame = {
    import graft.tables.Tables
    val frames = Map[String, DataFrame](
      "customer" -> Tables.customer(s, d), "documents" -> Tables.documents(s, d),
      "embeddings" -> Tables.embeddings(s, d), "events" -> Tables.events(s, d),
      "lineitem" -> Tables.lineitem(s, d), "nation" -> Tables.nation(s, d),
      "orders" -> Tables.orders(s, d), "part" -> Tables.part(s, d),
      "region" -> Tables.region(s, d), "supplier" -> Tables.supplier(s, d))
    ManifestKeys.map { case (t, k) =>
      frames(t).agg(count(lit(1)).as("n_rows"),
          sum(when(col(k).isNull, 1L).otherwise(0L)).as("n_null_keys"),
          countDistinct(col(k)).as("n_distinct_keys"))
        .select(lit(t).as("tbl"), col("n_rows"), col("n_null_keys"),
          col("n_distinct_keys"))
    }.reduce(_ unionByName _).orderBy("tbl")
  }

  /** Oracle SQL twin of [[corpusManifest]]. */
  def corpusManifestOracle: String =
    ManifestKeys.map { case (t, k) =>
      s"""SELECT '$t' AS tbl, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null_keys,
         |  CAST(count(DISTINCT $k) AS BIGINT) AS n_distinct_keys
         |FROM $t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
}
