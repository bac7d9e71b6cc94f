package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Core relational shapes: the enrichment join (reference J1), the keyed
  * upsert store / latest-per-key (reference W5/S4 — Cassandra
  * last-write-wins emulation), plus the standard agg/join/top-k/rollup
  * the rebuild gets from Catalyst for free (SURVEY.md §2.3/§2.4/§2.9).
  */
object RelationalOps {

  /** Latest event per key — the batch form of the reference's Cassandra
    * upsert store (`TrafficStreamProcessor.scala:42`,
    * `prepare_cassandra.sh:24-30`: PRIMARY KEY(bearer_id) ⇒
    * last-write-wins). One shuffle on the key; ties broken by event_id
    * so the result is deterministic.
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** Enrichment join (reference J1: celltowerStream ⋈ attach store ON
    * bearerId, inner — unmatched events dropped,
    * `TrafficStreamProcessor.scala:52-56`). CALLER CONTRACT: the
    * dimension side must be broadcast-sized (the reference's attach
    * store is bounded by live bearers); the hint keeps the fact side
    * unshuffled per micro-batch. For an unbounded dimension use a
    * plain join and let the planner shuffle.
    */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer),
      events("user_id") === customer("c_custkey"), "inner")

  /** TPC-H Q1-shaped pricing summary over lineitem: single-pass
    * multi-aggregate (count/sum/avg share one HashAggregate, exactly the
    * one-pass StatCounter trick the reference hand-rolled,
    * `MetricStats.scala:28-32` — Catalyst does it automatically).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        graft.functions.DetAgg.sumDiscounted2(
          col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        graft.functions.DetAgg.avgInt(col("l_quantity")).as("avg_qty"),
        graft.functions.DetAgg.avgCents2(col("l_extendedprice")).as("avg_price"),
        graft.functions.DetAgg.avgCents2(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-k by aggregate (reference has only `take(5)`; this is the
    * distributed form — partial agg → shuffle on group key → global
    * top-k via sort+limit, which Spark executes as TakeOrderedAndProject,
    * never materializing a full sort at scale).
    */
  def topCustomersByRevenue(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** Multi-way star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    * → revenue per nation. Only the CONSTANT-size dims (nation=25,
    * region=5 rows at every SF) carry a broadcast hint; customer and
    * orders SCALE with the data, so their join strategy is left to the
    * size threshold + AQE — broadcast at bench SFs, sort-merge at
    * 100 TB. A forced broadcast(customer) would be a scale bug: the
    * hint overrides the planner at ANY size.
    */
  /** Incremental view maintenance — the warehouse identity that makes
    * a 100 TB aggregate AFFORDABLE to keep fresh: a per-nation revenue
    * view is maintained by merging the BASE aggregate with per-group
    * DELTA CONTRIBUTIONS from a CDC batch (update ⇒ +new−old, delete
    * ⇒ −old) instead of re-scanning the fact table. The CDC batch is
    * deterministic in-query (keys %41 deleted — taking precedence —
    * keys %37 repriced by +cents DIV 10, exact integers), and the
    * ORACLE recomputes the view directly from the post-delta state —
    * so the hash gate proves `base ⊕ Δ = recompute`, which is the
    * whole IVM contract. Sum-mergeable aggregates only, by
    * construction; everything rides exact cents.
    *
    * Scale shape: base agg scans once (in production it's the stored
    * view); the delta side scans only CDC rows; dims broadcast; the
    * merge is a |nations|-row outer join.
    */
  def ivmRevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val base = o.join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("cents")).as("c0"), count(lit(1)).as("n0"))
    val delta = o
      .where(col("o_orderkey") % 41 === 0 || col("o_orderkey") % 37 === 0)
      .select(col("o_custkey"),
        when(col("o_orderkey") % 41 === 0, -col("cents"))
          .otherwise(expr("cents DIV 10")).as("dc"),
        when(col("o_orderkey") % 41 === 0, lit(-1L)).otherwise(lit(0L))
          .as("dn"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("dc")).as("dc"), sum(col("dn")).as("dn"))
    base.join(delta, Seq("n_name"), "left")
      .select(col("n_name").as("nation"),
        ((col("c0") + coalesce(col("dc"), lit(0L))).cast("double") / 100.0)
          .as("revenue"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n_orders"))
      .orderBy("nation")
  }

  /** Oracle SQL twin of [[ivmRevenueByNation]] — the DIRECT recompute
    * over the post-delta order set (no merge), the independent side of
    * the IVM identity.
    */
  def ivmRevenueByNationOracle: String =
    s"""WITH v2 AS (
       |  SELECT o_custkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT)
       |      + CASE WHEN o_orderkey % 37 = 0
       |          THEN CAST(round(o_totalprice * 100) AS BIGINT) // 10
       |          ELSE 0 END AS cents
       |  FROM orders WHERE o_orderkey % 41 <> 0
       |)
       |SELECT n.n_name AS nation,
       |  CAST(sum(v2.cents) AS DOUBLE) / 100.0 AS revenue,
       |  count(*) AS n_orders
       |FROM v2
       |JOIN customer c ON v2.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Interpolated quartiles (percentile_cont semantics) of order value
    * per market segment — the OTHER quantile convention ([[OutlierOp]]
    * is index-based/discrete): position `(n−1)·q` splits into
    * `idx = pos div 4` and a remainder, and the value interpolates
    * `lo + rem/4 · (hi − lo)`. The formula is spelled out EXPLICITLY
    * on both engines (never the built-in percentile functions, whose
    * edge conventions differ), so every arithmetic step is the same
    * double operation on the same operands. Per-group collect is
    * bounded by group size — q07's stance, with percentile_approx as
    * the documented swap.
    */
  def segmentPriceQuartiles(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    def interp(qnum: Int) = {
      val pos = (col("n") - 1) * qnum
      val idx = expr(s"((n - 1) * $qnum) DIV 4")
      val rem = pos - idx * 4
      val lo = element_at(col("vs"), (idx + 1).cast("int"))
      val hi = element_at(col("vs"), least(idx + 2, col("n")).cast("int"))
      round(lo + rem.cast("double") / 4.0 * (hi - lo), 4)
    }
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           sort_array(collect_list(col("o_totalprice"))).as("vs"))
      .select(col("c_mktsegment"), col("n"),
        interp(1).as("p25"), interp(2).as("p50"), interp(3).as("p75"))
      .orderBy("c_mktsegment")
  }

  /** Oracle SQL twin of [[segmentPriceQuartiles]]. */
  def segmentPriceQuartilesOracle: String = {
    def interp(qnum: Int, name: String) =
      s"""round(vs[((n - 1) * $qnum) // 4 + 1]
         |  + (((n - 1) * $qnum) % 4) / 4.0
         |    * (vs[least(((n - 1) * $qnum) // 4 + 2, n)]
         |       - vs[((n - 1) * $qnum) // 4 + 1]), 4) AS $name""".stripMargin
    s"""WITH j AS (
       |  SELECT c.c_mktsegment, o.o_totalprice
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |), g AS (
       |  SELECT c_mktsegment, count(*) AS n,
       |    list_sort(list(o_totalprice)) AS vs
       |  FROM j GROUP BY 1
       |)
       |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
       |  ${interp(1, "p25")},
       |  ${interp(2, "p50")},
       |  ${interp(3, "p75")}
       |FROM g ORDER BY c_mktsegment""".stripMargin
  }

  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = broadcast(Tables.nation(s, dir))
    val r  = broadcast(Tables.region(s, dir))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        graft.functions.DetAgg.sumDiscounted2(
          col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Analytic window ranking (SURVEY.md §2.5 — absent in the reference,
    * standard in the rebuild): top-3 orders per customer.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        col("o_totalprice").as("totalprice"))
      .orderBy("o_custkey", "rk")
  }

  /** Anti join: customers with no large order (set-op coverage, §2.9).
    * The filter is pushed below the join so the anti side shrinks before
    * the hash build — no null-unsafe NOT IN trap.
    */
  def customersWithoutOrders(s: SparkSession, dir: String,
                             minTotal: Double = 300000.0): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** ROLLUP hierarchy aggregate (grouping-sets coverage, §2.4-absent row). */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("revenue"), col("n_orders"))
      .orderBy("nation", "segment")

  /** CUBE over (nation, segment) with explicit grouping flags — the
    * full grouping-sets lattice ([[rollupRevenue]] covers the
    * hierarchy prefix form; CUBE adds the segment-only marginals).
    * `g_nation`/`g_segment` are the grouping() indicators, so an 'ALL'
    * label can never be confused with a real value named "ALL". One
    * expand + one partial-aggregated shuffle — Catalyst's Expand
    * multiplies rows AFTER the partial aggregate at each grouping set.
    */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      // grouping() is only legal inside the aggregate list of a
      // cube/rollup — referencing it in a later select throws
      // UNSUPPORTED_GROUPING_EXPRESSION.
      .agg(grouping(col("n_name")).cast("long").as("g_nation"),
           grouping(col("c_mktsegment")).cast("long").as("g_segment"),
           round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("g_nation"), col("g_segment"),
        col("revenue"), col("n_orders"))
      .orderBy("nation", "segment")

  /** Rank-family analytic windows in one pass: ntile quartile,
    * percent_rank, cume_dist of each order's price within its market
    * segment. The window ORDER BY carries the orderkey tiebreak, so
    * every rank (and therefore every output value) is deterministic.
    * percent_rank/cume_dist are exact integer-ratio doubles — identical
    * in both engines with NO rounding. One shuffle on the segment key.
    */
  def segmentPriceRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_mktsegment", "o_totalprice", "o_orderkey")
  }

  /** Histogram: fixed-width bucketing — pure arithmetic, no custom
    * operator, one partial-aggregated shuffle.
    */
  def priceHistogram(s: SparkSession, dir: String, width: Double = 1000.0): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(floor(col("l_extendedprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** TPC-H Q4 shape: EXISTS-style semi join — orders having at least one
    * deep-discount line, counted by priority. Plans as a hash semi join
    * (build = filtered lineitem keys only).
    */
  def prioritySemi(s: SparkSession, dir: String, minDisc: Double = 0.09): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).where(col("l_discount") >= minDisc),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** TPC-H Q17 shape: correlated scalar-aggregate subquery — revenue of
    * lines below half the part's average quantity. The subquery
    * decorrelates to an aggregate + join (Catalyst does this for SQL;
    * here it is written directly in its decorrelated form).
    */
  def smallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val avgQ = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("aq"))
    li.join(avgQ, col("l_partkey") === col("pk"))
      .where(col("l_quantity") < col("aq") * 0.5)
      .agg(
        // exact: cents sum / 7 with integer half-up (sum/7 is a
        // small-denominator rational — boundary-prone if float-rounded)
        (graft.functions.DetAgg.halfUpDiv(
          sum(round(col("l_extendedprice") * 100).cast("long")), lit(7L))
          .cast("double") / 100.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Brand profile across the full star: lineitem ⋈ part ⋈ supplier —
    * completes table coverage. part/supplier scale with SF, so no
    * broadcast hint (planner/AQE picks broadcast at bench SFs,
    * sort-merge at scale); one fact shuffle for the final aggregate.
    */
  def brandProfile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        round(sum(col("l_extendedprice")), 2).as("revenue"),
        graft.functions.DetAgg.avgInt(col("p_size")).as("avg_size"))
      .orderBy("p_brand")

  /** Salted equi-join for skewed keys: the small side is replicated
    * `salts` ways; each large-side row picks a deterministic salt, so a
    * single hot key fans across `salts` tasks instead of one straggler.
    * Semantics identical to `large ⋈ small ON key` (verified in
    * RelationalSpec); AQE's skew-join handles the same problem
    * adaptively, this is the explicit form for engines/configs without
    * it.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Explicit GROUPING SETS over an IRREGULAR lattice — ((nation,
    * segment), (segment), ()) — the grouping-sets form neither
    * [[rollupRevenue]] (hierarchy prefixes) nor [[cubeRevenue]] (full
    * lattice) can express: segment marginals and the grand total, but
    * NO nation-only marginal. Revenue is exact cents under the
    * integer-sum rule, so every lattice row hashes identically
    * cross-engine. Same physical shape as cube: one Expand (×3 here)
    * feeding one partially-aggregated shuffle.
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame = {
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), cents.as("cents"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("c_mktsegment")),
          Seq(col("c_mktsegment")), Seq.empty[org.apache.spark.sql.Column]),
        col("n_name"), col("c_mktsegment"))
      .agg(grouping(col("n_name")).cast("long").as("g_nation"),
        grouping(col("c_mktsegment")).cast("long").as("g_segment"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("g_nation"), col("g_segment"), col("revenue"), col("n_orders"))
      .orderBy("nation", "segment")
  }

  /** Oracle SQL twin of [[groupingSetsRevenue]]. */
  def groupingSetsRevenueOracle: String =
    """SELECT coalesce(n.n_name, 'ALL') AS nation,
      |  coalesce(c.c_mktsegment, 'ALL') AS segment,
      |  CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
      |  CAST(GROUPING(c.c_mktsegment) AS BIGINT) AS g_segment,
      |  CAST(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS DOUBLE) / 100.0 AS revenue,
      |  count(*) AS n_orders
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY GROUPING SETS ((n.n_name, c.c_mktsegment),
      |  (c.c_mktsegment), ())
      |ORDER BY nation, segment""".stripMargin

  /** Per-brand Pareto frontier (skyline) on (price ↓ better, size ↑
    * better): a part survives iff no same-brand part is at-least-as-good
    * on both axes and strictly better on one — the multi-objective
    * "best offers" screen. Computed WITHOUT the quadratic dominance
    * join: within each brand, sort by exact price cents and take the
    * running max size over strictly-cheaper rows (a RANGE frame ending
    * at −1 cent) plus the max size at the same price point; a row is
    * dominated iff either max beats it. One shuffle on the brand key;
    * the oracle independently re-derives the frontier with the
    * textbook NOT EXISTS dominance query.
    */
  def brandSkyline(s: SparkSession, dir: String): DataFrame = {
    val withC = Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"))
    val cheaper = Window.partitionBy(col("p_brand")).orderBy(col("pc"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy(col("p_brand"), col("pc"))
    withC
      .withColumn("max_cheaper", max(col("p_size")).over(cheaper))
      .withColumn("max_same", max(col("p_size")).over(samePrice))
      .where(coalesce(col("max_cheaper"), lit(Int.MinValue.toLong))
        < col("p_size") && col("max_same") <= col("p_size"))
      .select(col("p_brand"), col("p_partkey"),
        (col("pc").cast("double") / 100.0).as("price"), col("p_size"))
      .orderBy("p_brand", "p_partkey")
  }

  /** Oracle SQL twin of [[brandSkyline]] — the direct dominance test. */
  def brandSkylineOracle: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey, p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc
      |  FROM part
      |)
      |SELECT a.p_brand, a.p_partkey,
      |  CAST(a.pc AS DOUBLE) / 100.0 AS price, a.p_size
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE b.p_brand = a.p_brand AND b.pc <= a.pc
      |    AND b.p_size >= a.p_size
      |    AND (b.pc < a.pc OR b.p_size > a.p_size))
      |ORDER BY a.p_brand, a.p_partkey""".stripMargin

  /** Exact weighted median per brand: retail price weighted by size —
    * the "where does the bulk of inventory capacity sit on the price
    * axis" statistic (a plain median over-weights small parts). Lower
    * weighted median: the smallest price whose cumulative weight
    * reaches half the total, computed with one per-brand sort window
    * (cumulative weight, deterministic (price, partkey) order) and a
    * min-over-qualifying aggregate — integer arithmetic end to end
    * (2·cumw ≥ totw avoids the half division). Both shuffles key on
    * brand, so AQE reuses the exchange.
    */
  def weightedMedianPrice(s: SparkSession, dir: String): DataFrame = {
    val withC = Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        col("p_size").cast("long").as("wt"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"))
    val cum = Window.partitionBy(col("p_brand"))
      .orderBy(col("pc"), col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("p_brand"))
    withC
      .withColumn("cumw", sum(col("wt")).over(cum))
      .withColumn("totw", sum(col("wt")).over(tot))
      .groupBy(col("p_brand"))
      .agg(min(when(col("cumw") * 2 >= col("totw"), col("pc")))
          .as("med_pc"),
        max(col("totw")).as("total_weight"),
        count(lit(1)).as("n_parts"))
      .select(col("p_brand"),
        (col("med_pc").cast("double") / 100.0).as("wmedian_price"),
        col("total_weight"), col("n_parts"))
      .orderBy("p_brand")
  }

  /** Oracle SQL twin of [[weightedMedianPrice]]. */
  def weightedMedianPriceOracle: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS wt,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc
      |  FROM part
      |), w AS (
      |  SELECT p_brand, pc, wt,
      |    sum(wt) OVER (PARTITION BY p_brand ORDER BY pc, p_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    sum(wt) OVER (PARTITION BY p_brand) AS totw
      |  FROM p
      |)
      |SELECT p_brand,
      |  CAST(min(CASE WHEN cumw * 2 >= totw THEN pc END) AS DOUBLE) / 100.0
      |    AS wmedian_price,
      |  CAST(max(totw) AS BIGINT) AS total_weight, count(*) AS n_parts
      |FROM w GROUP BY 1 ORDER BY p_brand""".stripMargin

  /** RFM customer segmentation — recency / frequency / monetary
    * quintiles, the standard CRM partitioning, built entirely from
    * exact integers: recency anchors at the data's max order date
    * (never wall-clock), monetary sums exact cents, and each metric
    * buckets by the RANK rule b = ⌊(rn−1)·5/n⌋+1 with a total
    * (metric, custkey) order — deterministic under ties and
    * mirrorable, unlike NTILE's arbitrary tie split. Output: one row
    * per populated (r, f, m) cell with customer count and cell
    * revenue.
    *
    * Scale shape: one groupBy(custkey) over orders, three window
    * ranks over the |customers| frame, one ≤125-row rollup.
    */
  def rfmSegments(orders: DataFrame): DataFrame =
    rfmPerCustomer(orders)
      .groupBy(col("rb"), col("fb"), col("mb"))
      .agg(count(lit(1)).as("n_customers"), sum(col("mon")).as("cell_cents"))
      .orderBy("rb", "fb", "mb")

  /** The shared per-customer (rec_days, freq, mon) rollup both RFM
    * arms bucket. */
  private[graft] def rfmPerFrame(orders: DataFrame): DataFrame = {
    val ms = unix_millis(col("o_orderdate"))
    val maxMs = orders.agg(max(ms).as("mx"))
    orders.crossJoin(broadcast(maxMs))
      .groupBy(col("o_custkey"))
      .agg(min(call_function("div", col("mx") - ms, lit(86400000L)))
          .as("rec_days"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("mon"))
  }

  /** [[rfmSegments]]'s per-customer frame with EXACT rank-rule
    * buckets (exposed for the binned arm's agreement spec). */
  private[graft] def rfmPerCustomer(orders: DataFrame): DataFrame = {
    val per = rfmPerFrame(orders)
    def bucket(metric: String): org.apache.spark.sql.Column = {
      val w = Window.orderBy(col(metric), col("o_custkey"))
      val n = count(lit(1)).over(Window.partitionBy())
      call_function("div", (row_number().over(w) - 1L) * 5L, n) + 1L
    }
    per
      .withColumn("rb", bucket("rec_days"))
      .withColumn("fb", bucket("freq"))
      .withColumn("mb", bucket("mon"))
  }

  /** Oracle SQL twin of [[rfmSegments]]. */
  def rfmSegmentsOracle: String =
    s"""WITH mx AS (SELECT max(epoch_ms(o_orderdate)) AS m FROM orders),
       |per AS (
       |  SELECT o_custkey,
       |    min((mx.m - epoch_ms(o_orderdate)) // 86400000) AS rec_days,
       |    count(*) AS freq,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS mon
       |  FROM orders, mx GROUP BY 1, mx.m
       |), b AS (
       |  SELECT o_custkey, mon,
       |    ((row_number() OVER (ORDER BY rec_days, o_custkey) - 1) * 5)
       |      // (count(*) OVER ()) + 1 AS rb,
       |    ((row_number() OVER (ORDER BY freq, o_custkey) - 1) * 5)
       |      // (count(*) OVER ()) + 1 AS fb,
       |    ((row_number() OVER (ORDER BY mon, o_custkey) - 1) * 5)
       |      // (count(*) OVER ()) + 1 AS mb
       |  FROM per
       |)
       |SELECT rb, fb, mb, count(*) AS n_customers,
       |  CAST(sum(mon) AS BIGINT) AS cell_cents
       |FROM b GROUP BY 1, 2, 3 ORDER BY rb, fb, mb""".stripMargin

  /** q251: [[rfmSegments]]'s approx-binned arm — the 100× scale path
    * for the three unpartitioned rank windows: quintile BOUNDARIES
    * come from a bottom-k-by-hash customer sample
    * ([[ScaleOps.sampledBinIntervals]], mergeable and deterministic),
    * broadcast back as three 5-row interval frames; each customer's
    * (r, f, m) cell is then three map-side broadcast joins — no
    * global sort anywhere, so the plan holds at any |customers|.
    * Same output shape as the exact arm; RfmBinnedSpec proves every
    * customer's sampled bucket is within one of its exact-rank bucket
    * at sf0.01. The exact arm stays the oracled default for rank
    * parity; this arm carries its own full hash-gated oracle (the
    * sample is the portable-hash PRNG, the q158 stance).
    */
  def rfmSegmentsBinned(orders: DataFrame, k: Int = 256): DataFrame =
    rfmPerCustomerBinned(orders, k)
      .groupBy(col("rb"), col("fb"), col("mb"))
      .agg(count(lit(1)).as("n_customers"), sum(col("mon")).as("cell_cents"))
      .orderBy("rb", "fb", "mb")

  /** [[rfmSegmentsBinned]]'s per-customer frame with sampled-boundary
    * buckets (exposed for the agreement spec). */
  private[graft] def rfmPerCustomerBinned(orders: DataFrame,
                                          k: Int = 256): DataFrame = {
    import graft.functions.TextFunctions.portableHash
    val per = rfmPerFrame(orders)
    val hx = portableHash(reverse(col("o_custkey").cast("string")))
    def iv(metric: String, out: String) =
      ScaleOps.sampledBinIntervals(per, hx, col("o_custkey"),
          col(metric), bins = 5, k = k)
        .select(col("bin").as(out), col("lo"), col("hi"))
    val withR = ScaleOps.binAssign(per, iv("rec_days", "rb"),
      col("rec_days"))
    val withF = ScaleOps.binAssign(withR, iv("freq", "fb"), col("freq"))
    ScaleOps.binAssign(withF, iv("mon", "mb"), col("mon"))
  }

  /** Oracle SQL twin of [[rfmSegmentsBinned]]. */
  def rfmSegmentsBinnedOracle(k: Int = 256): String = {
    val h = graft.functions.TextFunctions.portableHashSql(
      "reverse(CAST(o_custkey AS VARCHAR))")
    def base(metric: String) =
      s"(SELECT $h AS hx, o_custkey AS id, $metric AS v FROM per)"
    s"""WITH mx AS (SELECT max(epoch_ms(o_orderdate)) AS m FROM orders),
       |per AS (
       |  SELECT o_custkey,
       |    min((mx.m - epoch_ms(o_orderdate)) // 86400000) AS rec_days,
       |    count(*) AS freq,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS mon
       |  FROM orders, mx GROUP BY 1, mx.m
       |), ${ScaleOps.binIntervalsSql(base("rec_days"), 5, k, "r")},
       |${ScaleOps.binIntervalsSql(base("freq"), 5, k, "f")},
       |${ScaleOps.binIntervalsSql(base("mon"), 5, k, "m")},
       |b AS (
       |  SELECT p.mon, riv.bin AS rb, fiv.bin AS fb, miv.bin AS mb
       |  FROM per p
       |  JOIN riv ON (riv.lo IS NULL OR p.rec_days > riv.lo)
       |    AND (riv.hi IS NULL OR p.rec_days <= riv.hi)
       |  JOIN fiv ON (fiv.lo IS NULL OR p.freq > fiv.lo)
       |    AND (fiv.hi IS NULL OR p.freq <= fiv.hi)
       |  JOIN miv ON (miv.lo IS NULL OR p.mon > miv.lo)
       |    AND (miv.hi IS NULL OR p.mon <= miv.hi)
       |)
       |SELECT rb, fb, mb, count(*) AS n_customers,
       |  CAST(sum(mon) AS BIGINT) AS cell_cents
       |FROM b GROUP BY 1, 2, 3 ORDER BY rb, fb, mb""".stripMargin
  }

  /** Customer-cohort LTV triangle — revenue by (acquisition cohort ×
    * age), the table a growth team reads cumulative along each row.
    * Cohort and age are 30-day buckets of integer epoch arithmetic
    * (locale/calendar-proof, the q146 rule); revenue is exact cents;
    * the running cumulative per cohort is a ≤|cohorts×ages|-row
    * window.
    */
  def ltvCohorts(orders: DataFrame): DataFrame = {
    val bucket = call_function("div",
      call_function("div", unix_millis(col("o_orderdate")), lit(86400000L)),
      lit(30L))
    val withB = orders.select(col("o_custkey"), bucket.as("b"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val cohort = withB.groupBy(col("o_custkey")).agg(min(col("b")).as("c0"))
    val cells = withB.join(cohort, Seq("o_custkey"))
      .groupBy(col("c0").as("cohort"), (col("b") - col("c0")).as("age"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .orderBy("cohort", "age")
  }

  /** Oracle SQL twin of [[ltvCohorts]]. */
  def ltvCohortsOracle: String =
    s"""WITH wb AS (
       |  SELECT o_custkey,
       |    (epoch_ms(o_orderdate) // 86400000) // 30 AS b,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders
       |), c0 AS (SELECT o_custkey, min(b) AS c0 FROM wb GROUP BY 1),
       |cells AS (
       |  SELECT c0.c0 AS cohort, wb.b - c0.c0 AS age,
       |    count(DISTINCT wb.o_custkey) AS n_active,
       |    CAST(sum(wb.cents) AS BIGINT) AS rev_cents
       |  FROM wb JOIN c0 USING (o_custkey)
       |  GROUP BY 1, 2
       |)
       |SELECT cohort, age, n_active, rev_cents,
       |  CAST(sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_rev_cents
       |FROM cells ORDER BY cohort, age""".stripMargin

  /** ABC (Pareto) part classification — parts ranked by discounted
    * revenue; class A carries the first 80% of revenue, B to 95%, C
    * the tail. The classic inventory cut, in exact integer 1e-4
    * currency units with the share comparisons cross-multiplied
    * (cum·100 ≤ total·80) so no ratio ever materializes. Per class:
    * part count, revenue, and exact ppm revenue share.
    */
  /** The shared per-part revenue rollup both ABC arms classify. */
  private[graft] def abcPerFrame(lineitem: DataFrame): DataFrame = {
    val units = expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
      (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))
    lineitem.groupBy(col("l_partkey")).agg(sum(units).as("rev"))
  }

  /** [[abcClassification]]'s per-part frame with the EXACT cumulative
    * rank class (exposed for the binned arm's agreement spec);
    * carries `total` for the share rollup. */
  private[graft] def abcPerPart(lineitem: DataFrame): DataFrame = {
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    abcPerFrame(lineitem)
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("total", sum(col("rev")).over(Window.partitionBy()))
      .withColumn("cls",
        when(col("cum") * 100L <= col("total") * 80L, "A")
          .when(col("cum") * 100L <= col("total") * 95L, "B")
          .otherwise("C"))
  }

  def abcClassification(lineitem: DataFrame): DataFrame =
    abcPerPart(lineitem)
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_units"),
        // the share ratio scales both aggregates to whole currency
        // units first — ppm × 1e-4-unit sums would pass 2⁶³ (mirrored
        // identically in the oracle, so the rounding stays hash-equal)
        graft.functions.DetAgg.ratio(
          call_function("div", sum(col("rev")), lit(10000L)),
          call_function("div", max(col("total")), lit(10000L)), 6)
          .as("rev_share"))
      .orderBy("cls")

  /** Oracle SQL twin of [[abcClassification]]. */
  def abcClassificationOracle: String =
    s"""WITH per AS (
       |  SELECT l_partkey,
       |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
       |      AS rev
       |  FROM lineitem GROUP BY 1
       |), c AS (
       |  SELECT rev,
       |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(rev) OVER () AS BIGINT) AS total
       |  FROM per
       |)
       |SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
       |            WHEN cum * 100 <= total * 95 THEN 'B'
       |            ELSE 'C' END AS cls,
       |  count(*) AS n_parts, CAST(sum(rev) AS BIGINT) AS rev_units,
       |  ${graft.functions.DetAgg.ratioSql(
            "(CAST(sum(rev) AS BIGINT) // 10000)",
            "(CAST(max(total) AS BIGINT) // 10000)", 6)}
       |    AS rev_share
       |FROM c GROUP BY 1 ORDER BY cls""".stripMargin

  /** [[abcBinned]]'s per-bin frame with the bin-granular class
    * (columns bin, n, rev, cum, total, cls — exposed for the
    * agreement spec, which re-joins parts to bins to compare classes
    * part-by-part against [[abcPerPart]]). */
  private[graft] def abcPerBin(lineitem: DataFrame, bins: Int = 64,
                               k: Int = 256): DataFrame = {
    import graft.functions.TextFunctions.portableHash
    val per = abcPerFrame(lineitem)
    val hx = portableHash(reverse(col("l_partkey").cast("string")))
    val iv = ScaleOps.sampledBinIntervals(per, hx, col("l_partkey"),
      col("rev"), bins, k)
    val perBin = ScaleOps.binAssign(per, iv, col("rev"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("rev"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("total", sum(col("rev")).over(Window.partitionBy()))
      .withColumn("cls",
        when(col("cum") * 100L <= col("total") * 80L, "A")
          .when(col("cum") * 100L <= col("total") * 95L, "B")
          .otherwise("C"))
  }

  /** q252: [[abcClassification]]'s approx-binned arm — the 100× scale
    * path for the Pareto cumulative rank: parts are assigned to `bins`
    * revenue bins by sampled boundaries ([[ScaleOps
    * .sampledBinIntervals]] broadcast, map-side join, no global sort
    * over |parts|), the per-bin rollup is ≤`bins` rows, and the
    * cumulative 80/95 classification runs on THAT frame (a window
    * over ≤64 rows is free at any corpus size). A bin straddling a
    * cut goes wholly to the richer class — the one-bucket
    * approximation AbcBinnedSpec bounds against the exact arm at
    * sf0.01. Same output shape as the exact arm; own hash-gated
    * oracle.
    */
  def abcBinned(lineitem: DataFrame, bins: Int = 64,
                k: Int = 256): DataFrame =
    abcPerBin(lineitem, bins, k)
      .groupBy(col("cls"))
      .agg(sum(col("n")).as("n_parts"), sum(col("rev")).as("rev_units"),
        graft.functions.DetAgg.ratio(
          call_function("div", sum(col("rev")), lit(10000L)),
          call_function("div", max(col("total")), lit(10000L)), 6)
          .as("rev_share"))
      .orderBy("cls")

  /** Oracle SQL twin of [[abcBinned]]. */
  def abcBinnedOracle(bins: Int = 64, k: Int = 256): String = {
    val h = graft.functions.TextFunctions.portableHashSql(
      "reverse(CAST(l_partkey AS VARCHAR))")
    s"""WITH per AS (
       |  SELECT l_partkey,
       |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
       |      AS rev
       |  FROM lineitem GROUP BY 1
       |), ${ScaleOps.binIntervalsSql(
            s"(SELECT $h AS hx, l_partkey AS id, rev AS v FROM per)",
            bins, k)},
       |pb AS (
       |  SELECT iv.bin, count(*) AS n, CAST(sum(p.rev) AS BIGINT) AS rev
       |  FROM per p
       |  JOIN iv ON (iv.lo IS NULL OR p.rev > iv.lo)
       |    AND (iv.hi IS NULL OR p.rev <= iv.hi)
       |  GROUP BY 1
       |), c AS (
       |  SELECT n, rev,
       |    CAST(sum(rev) OVER (ORDER BY bin DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(rev) OVER () AS BIGINT) AS total
       |  FROM pb
       |)
       |SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
       |            WHEN cum * 100 <= total * 95 THEN 'B'
       |            ELSE 'C' END AS cls,
       |  CAST(sum(n) AS BIGINT) AS n_parts,
       |  CAST(sum(rev) AS BIGINT) AS rev_units,
       |  ${graft.functions.DetAgg.ratioSql(
            "(CAST(sum(rev) AS BIGINT) // 10000)",
            "(CAST(max(total) AS BIGINT) // 10000)", 6)}
       |    AS rev_share
       |FROM c GROUP BY 1 ORDER BY cls""".stripMargin
  }

  /** Time-decayed item popularity — "what's trending": each lineitem
    * contributes weight 10⁶ >> (age in 30-day half-lives), anchored at
    * the corpus's max ship date (data-derived, so the query is
    * deterministic and cache-stable — never wall-clock). The weights
    * are exact integer shifts (no float pow), halving per month of
    * age and bottoming out at 0 past ~20 half-lives, so a burst of
    * recent sales outranks a long-dead bestseller. Top `k` parts by
    * decayed weight, ties to the smaller part key.
    *
    * Scale shape: one scan with a row-local weight, one map-side-
    * combined groupBy(part), one top-k sort of the |parts| aggregate.
    */
  def trendingParts(lineitem: DataFrame, k: Int = 20,
                    halfLifeDays: Long = 30L): DataFrame = {
    val ms = unix_millis(col("l_shipdate"))
    val maxMs = lineitem.agg(max(ms).as("mx"))
    // shiftleft's amount must be a column in SQL form (the Scala API
    // only takes a literal Int shift)
    val wt = expr(
      s"""1000000L DIV shiftleft(1L, CAST(least(
         |  ((mx - unix_millis(l_shipdate)) DIV 86400000L) DIV ${halfLifeDays}L,
         |  30L) AS INT))""".stripMargin)
    lineitem.crossJoin(broadcast(maxMs))
      .select(col("l_partkey"), wt.as("w"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("w")).as("decayed_weight"), count(lit(1)).as("n_lines"))
      .orderBy(col("decayed_weight").desc, col("l_partkey"))
      .limit(k)
  }

  /** Oracle SQL twin of [[trendingParts]]. */
  def trendingPartsOracle(k: Int = 20, halfLifeDays: Long = 30L): String =
    s"""WITH mx AS (SELECT max(epoch_ms(l_shipdate)) AS m FROM lineitem),
       |w AS (
       |  SELECT l_partkey,
       |    1000000 // (CAST(1 AS BIGINT) << CAST(least(
       |      ((mx.m - epoch_ms(l_shipdate)) // 86400000) // $halfLifeDays,
       |      30) AS INTEGER)) AS w
       |  FROM lineitem, mx
       |)
       |SELECT l_partkey, CAST(sum(w) AS BIGINT) AS decayed_weight,
       |  count(*) AS n_lines
       |FROM w GROUP BY 1
       |ORDER BY decayed_weight DESC, l_partkey LIMIT $k""".stripMargin

  /** Order→ship lead-time distribution per order priority — the SLA
    * percentile table (p50/p90/p99 of days from order to line
    * shipment), with every percentile an EXACT 1-indexed order
    * statistic (idx = ⌈p·n⌉; p50 is the lower median, the
    * [[OutlierOp]] convention) — percentile_approx would neither
    * hash-gate nor mean anything auditable.
    *
    * Scale shape: ONE fact-to-fact shuffle (lineitem ⋈ orders on the
    * order key), then a per-priority window sort of the narrow
    * (priority, lag) projection; the final rollup is 5 rows.
    */
  def leadTimeQuantiles(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val lag = call_function("div",
      unix_millis(col("l_shipdate")) - unix_millis(col("o_orderdate")),
      lit(86400000L))
    val base = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"), lag.as("lag_days"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("prio"))
      .orderBy(col("lag_days"), col("l_orderkey"), col("l_linenumber"))
    val wc = Window.partitionBy(col("prio"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy(col("prio"))
      .agg(max(col("n")).as("n_lines"),
        min(col("lag_days")).as("min_days"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("lag_days")))
          .as("p50_days"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("lag_days")))
          .as("p90_days"),
        max(when(col("rn") === expr("(99 * n + 99) DIV 100"), col("lag_days")))
          .as("p99_days"),
        max(col("lag_days")).as("max_days"))
      .select(col("prio").as("o_orderpriority"), col("n_lines"),
        col("min_days"), col("p50_days"), col("p90_days"), col("p99_days"),
        col("max_days"))
      .orderBy("o_orderpriority")
  }

  /** Oracle SQL twin of [[leadTimeQuantiles]]. */
  def leadTimeQuantilesOracle: String =
    s"""WITH b AS (
       |  SELECT o.o_orderpriority AS prio,
       |    (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)) // 86400000
       |      AS lag_days,
       |    l.l_orderkey, l.l_linenumber
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), r AS (
       |  SELECT prio, lag_days,
       |    row_number() OVER (PARTITION BY prio
       |      ORDER BY lag_days, l_orderkey, l_linenumber) AS rn,
       |    count(*) OVER (PARTITION BY prio) AS n
       |  FROM b
       |)
       |SELECT prio AS o_orderpriority,
       |  CAST(max(n) AS BIGINT) AS n_lines,
       |  min(lag_days) AS min_days,
       |  max(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS p50_days,
       |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS p90_days,
       |  max(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_days END)
       |    AS p99_days,
       |  max(lag_days) AS max_days
       |FROM r GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Index of dispersion (variance-to-mean ratio) of order basket
    * sizes per priority — the Poissonness check a demand model starts
    * from: D ≈ 1 means item counts arrive Poisson-like, D > 1 means
    * clumping. Exact integer moments into one closed form,
    * D_ppm = ⌊10⁶·(n·Σx² − (Σx)²) / (n·Σx)⌉ — no float variance, so
    * the statistic hash-gates. The variance numerator n·Σx²·10⁶ passed
    * 2⁶³ near ~1 M orders per group, so it is computed in
    * DECIMAL(38,0) on the Spark side and HUGEINT in the oracle
    * ([[graft.functions.DetAgg.halfUpDivHugeSql]]) — the binding bound
    * moves out to ~1e15 orders per group (the 10⁶-scaled numerator
    * reaching 1e38), far past any real scale factor; the quotient
    * itself is ppm-sized, so the output stays BIGINT both sides
    * (StatsAndIqrSpec checks the promoted path against BigInt
    * arithmetic past 2⁶³).
    */
  def basketDispersion(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    import graft.functions.DetAgg
    val sizes = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x"))
    val base = sizes.join(
      orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority").as("prio")), Seq("l_orderkey"))
    base.groupBy(col("prio"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("x")).as("s"), sum(col("x") * col("x")).as("q"))
      .select(col("prio").as("o_orderpriority"), col("n_orders"),
        DetAgg.ratio(col("s"), col("n_orders")).as("mean_items"),
        DetAgg.halfUpDiv(
          (col("n_orders").cast("decimal(38,0)") * col("q")
            - col("s").cast("decimal(38,0)") * col("s"))
            * lit(1000000L),
          (col("n_orders") * col("s")).cast("decimal(38,0)"))
          .cast("long").as("dispersion_ppm"))
      .orderBy("o_orderpriority")
  }

  /** Oracle SQL twin of [[basketDispersion]]. */
  def basketDispersionOracle: String = {
    import graft.functions.DetAgg
    s"""WITH s AS (SELECT l_orderkey, count(*) AS x FROM lineitem
       |           GROUP BY 1),
       |b AS (
       |  SELECT o.o_orderpriority AS prio, s.x
       |  FROM s JOIN orders o ON s.l_orderkey = o.o_orderkey
       |), m AS (
       |  SELECT prio, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    sum(x * x) AS q
       |  FROM b GROUP BY 1
       |)
       |SELECT prio AS o_orderpriority, n AS n_orders,
       |  ${DetAgg.ratioSql("sx", "n")} AS mean_items,
       |  ${DetAgg.halfUpDivHugeSql(
            "(CAST(n AS HUGEINT) * q - CAST(sx AS HUGEINT) * sx) * 1000000",
            "n * sx")}
       |    AS dispersion_ppm
       |FROM m ORDER BY 1""".stripMargin
  }

  /** Equi-depth (equal-frequency) histogram of extended price — the
    * histogram an optimizer or data-profiler keeps when value skew
    * makes equal-WIDTH bins useless (q12's sibling). Ties stay
    * together: buckets are assigned at the DISTINCT-VALUE level by the
    * integer rule b = ⌊start·B/N⌋ where start = rows before the value
    * group — a tie never straddles a boundary (unlike row-level NTILE,
    * whose arbitrary tie-splitting also makes it unmirrorable), and
    * bucket sizes stay within one value-group of N/B.
    *
    * Scale shape: one groupBy builds the value histogram; the global
    * window runs over the DISTINCT-value frame — bounded by the price
    * DOMAIN cardinality, not the row count (the q94 count-of-counts
    * argument), so the single-partition sort never sees fact-table
    * rows. The final rollup is B rows.
    */
  def equiDepthHistogram(lineitem: DataFrame, buckets: Int = 8): DataFrame = {
    val cents = expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    val h = lineitem.select(cents.as("pc"))
      .groupBy(col("pc")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("pc"))
    h.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("b",
        call_function("div", (col("cum") - col("cnt")) * buckets,
          max(col("cum")).over(Window.partitionBy())) + 1L)
      .groupBy(col("b"))
      .agg(sum(col("cnt")).as("n"),
        min(col("pc")).as("lo_cents"), max(col("pc")).as("hi_cents"),
        sum(col("pc") * col("cnt")).as("sum_cents"))
      .select(col("b").as("bucket"), col("n"), col("lo_cents"),
        col("hi_cents"), col("sum_cents"))
      .orderBy("bucket")
  }

  /** Oracle SQL twin of [[equiDepthHistogram]] — same value-level
    * integer bucket rule. */
  def equiDepthHistogramOracle(buckets: Int = 8): String =
    s"""WITH h AS (
       |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem GROUP BY 1
       |), c AS (
       |  SELECT pc, cnt,
       |    CAST(sum(cnt) OVER (ORDER BY pc) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER () AS BIGINT) AS n_total
       |  FROM h
       |)
       |SELECT ((cum - cnt) * $buckets // n_total) + 1 AS bucket,
       |  CAST(sum(cnt) AS BIGINT) AS n,
       |  min(pc) AS lo_cents, max(pc) AS hi_cents,
       |  CAST(sum(pc * cnt) AS BIGINT) AS sum_cents
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** q299: supplier revenue concentration per nation — the Herfindahl–
    * Hirschman index HHI = Σ(sᵢ/S)² in ppm over supplier revenue
    * shares: the procurement-risk number (10 000 ppm-scale: >2 500 ppm
    * ×100 is the antitrust "concentrated" line) that q183's ABC
    * classes only bin. Exact integers end-to-end: revenue in cents,
    * Σrevᵢ² and S² in DECIMAL(38,0)/HUGEINT (cents² passes 2⁶³ at a
    * few $100M per supplier — loud, not wrapped), one halfUp division.
    *
    * Scale shape: one map-side-combined per-supplier revenue rollup
    * (the natural l_suppkey shuffle), two broadcast-sized dim joins
    * (supplier → nation), one |nations|-row rollup.
    */
  def supplierHhi(lineitem: DataFrame, supplier: DataFrame,
                  nation: DataFrame): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val rev = lineitem.select(col("l_suppkey").as("sk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("sk")).agg(sum(col("cents")).as("rev"))
    rev
      .join(broadcast(supplier.select(col("s_suppkey").as("sk"),
        col("s_nationkey").as("nk"))), Seq("sk"))
      .join(broadcast(nation.select(col("n_nationkey").as("nk"),
        col("n_name"))), Seq("nk"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("total_cents"),
        sum(dec(col("rev")) * col("rev")).as("s2"))
      .select(col("n_name").as("nation"), col("n_suppliers"),
        col("total_cents"),
        halfUpDiv(col("s2") * 1000000L,
          dec(col("total_cents")) * col("total_cents")).as("hhi_ppm"))
      .orderBy("nation")
  }

  /** Oracle SQL twin of [[supplierHhi]]. */
  def supplierHhiOracle: String = {
    import graft.functions.DetAgg.halfUpDivHugeSql
    s"""WITH r AS (
       |  SELECT l_suppkey AS sk,
       |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
       |      AS BIGINT) AS rev
       |  FROM lineitem GROUP BY 1
       |), g AS (
       |  SELECT n.n_name AS nation,
       |    CAST(count(*) AS BIGINT) AS n_suppliers,
       |    CAST(sum(r.rev) AS BIGINT) AS total_cents,
       |    sum(CAST(r.rev AS HUGEINT) * r.rev) AS s2
       |  FROM r
       |  JOIN supplier s ON s.s_suppkey = r.sk
       |  JOIN nation n ON n.n_nationkey = s.s_nationkey
       |  GROUP BY 1
       |)
       |SELECT nation, n_suppliers, total_cents,
       |  ${halfUpDivHugeSql("s2 * 1000000",
            "CAST(total_cents AS HUGEINT) * total_cents")} AS hhi_ppm
       |FROM g ORDER BY nation""".stripMargin
  }
}
