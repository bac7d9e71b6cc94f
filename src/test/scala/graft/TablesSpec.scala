package graft

import org.apache.spark.sql.functions.{col, expr, unix_millis}
import org.apache.spark.sql.types.TimestampType
import graft.tables.Tables

/** Schema-drift regression guard (VERDICT r7 §Next-round 3).
  *
  * The driver has regenerated the testdata twice already (parquet
  * TIMESTAMP(NANOS) → timestamp[us]/TIMESTAMP_NTZ). Whatever physical
  * type `events.ts` ships as, `Tables.events` must normalize it to a
  * canonical `TimestampType` so `unix_millis(ts)` and `window(ts, …)`
  * analyze. The next flip (back to nanos, to LTZ, to string…) must fail
  * HERE, not as 26 crashed driver queries.
  */
class TablesSpec extends SparkSuite {
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)

  test("events.ts normalizes to TimestampType in every sf dir") {
    for (d <- sfDirs) {
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"$d: ts is ${df.schema("ts").dataType}, expected TimestampType")
    }
  }

  test("date columns normalize to TimestampType (lineitem, orders)") {
    for (d <- sfDirs) {
      assert(Tables.lineitem(spark, d).schema("l_shipdate").dataType
        == TimestampType, s"$d: l_shipdate not TimestampType")
      assert(Tables.orders(spark, d).schema("o_orderdate").dataType
        == TimestampType, s"$d: o_orderdate not TimestampType")
    }
    // and unix_millis analyzes on both
    val d = sfDirs.head
    Tables.lineitem(spark, d)
      .select(unix_millis(col("l_shipdate"))).limit(1).collect()
    Tables.orders(spark, d)
      .select(unix_millis(col("o_orderdate"))).limit(1).collect()
  }

  test("unix_millis(ts) analyzes and yields sane epochs") {
    for (d <- sfDirs.take(1)) {
      val row = Tables.events(spark, d)
        .select(unix_millis(col("ts")).as("ms")).agg(expr("min(ms)"), expr("max(ms)"))
        .head()
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      // epoch-millis plausibility: between 2000-01-01 and 2100-01-01
      assert(lo > 946684800000L && hi < 4102444800000L, s"$d: ms range [$lo,$hi]")
    }
  }

  test("window(ts) analyzes on the loaded events table") {
    val d = sfDirs.head
    val df = Tables.events(spark, d)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour"))
      .count()
    assert(df.schema.fieldNames.contains("window"))
    assert(df.limit(1).collect().nonEmpty)
  }

  /** Whole-catalog column guard: every column an operator depends on,
    * per table. The driver regenerates the testdata between rounds —
    * a dropped/renamed column (or a type leaving its family) must fail
    * HERE with a nameable diff, not as a scatter of AnalysisExceptions
    * across the query suite. Type families (not exact types) so benign
    * widenings (int→long, float→double) stay green; the queries cast
    * at use sites.
    */
  test("all tables keep their operator-required columns and type families") {
    import org.apache.spark.sql.types._
    def fam(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "int"
      case FloatType | DoubleType | _: DecimalType => "frac"
      case StringType => "str"
      case TimestampType | TimestampNTZType => "ts"
      case ArrayType(et, _) => "arr:" + fam(et)
      case other => other.simpleString
    }
    val want: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, Seq[(String, String)])] = Seq(
      ("region", Tables.region _, Seq("r_regionkey" -> "int", "r_name" -> "str")),
      ("nation", Tables.nation _, Seq("n_nationkey" -> "int",
        "n_name" -> "str", "n_regionkey" -> "int")),
      ("customer", Tables.customer _, Seq("c_custkey" -> "int",
        "c_name" -> "str", "c_nationkey" -> "int", "c_acctbal" -> "frac",
        "c_mktsegment" -> "str")),
      ("supplier", Tables.supplier _, Seq("s_suppkey" -> "int",
        "s_name" -> "str", "s_nationkey" -> "int", "s_acctbal" -> "frac")),
      ("part", Tables.part _, Seq("p_partkey" -> "int", "p_name" -> "str",
        "p_brand" -> "str", "p_type" -> "str", "p_size" -> "int",
        "p_retailprice" -> "frac")),
      ("orders", Tables.orders _, Seq("o_orderkey" -> "int",
        "o_custkey" -> "int", "o_orderstatus" -> "str",
        "o_totalprice" -> "frac", "o_orderdate" -> "ts",
        "o_orderpriority" -> "str")),
      ("lineitem", Tables.lineitem _, Seq("l_orderkey" -> "int",
        "l_partkey" -> "int", "l_suppkey" -> "int", "l_linenumber" -> "int",
        "l_quantity" -> "frac", "l_extendedprice" -> "frac",
        "l_discount" -> "frac", "l_tax" -> "frac", "l_returnflag" -> "str",
        "l_linestatus" -> "str", "l_shipdate" -> "ts")),
      ("events", Tables.events _, Seq("event_id" -> "int", "ts" -> "ts",
        "user_id" -> "int", "event_type" -> "str", "value" -> "frac",
        "props" -> "str")),
      ("documents", Tables.documents _, Seq("doc_id" -> "int",
        "text" -> "str", "lang" -> "str", "source" -> "str",
        "n_chars" -> "int")),
      ("embeddings", Tables.embeddings _, Seq("vec_id" -> "int",
        "embedding" -> "arr:frac", "label" -> "int")))
    val d = sfDirs.head
    for ((name, loader, cols) <- want) {
      val schema = loader(spark, d).schema
      for ((cn, f) <- cols) {
        assert(schema.fieldNames.contains(cn), s"$name: missing column $cn")
        assert(fam(schema(cn).dataType) == f,
          s"$name.$cn: ${schema(cn).dataType} not in family $f")
      }
    }
  }

  /** Negative-epoch floor-division property (ADVICE r6/VERDICT r7 item 6).
    *
    * The temporal bucketing kernel is
    * `(ms - pmod(ms, step)) DIV step` (EventOps.floorDivMs). Both
    * engines' bare integer divisions truncate toward zero (Spark `DIV`,
    * and DuckDB `//` too: (-7)//2 = -3). The pmod-subtract form
    * must equal mathematical floor division for ANY sign — pinned here on
    * pre-1970 (negative) epochs so the documented cross-engine risk stays
    * closed even if the shipped data ever grows old clocks.
    */
  test("pmod-subtract bucketing equals Math.floorDiv on negative epochs") {
    import spark.implicits._
    val steps = Seq(1000L, 60000L, 3600000L, 86400000L)
    // Deterministic sample straddling 1970, including exact multiples ±1.
    val ms = (-20 to 20).map(_ * 7_777_777L) ++
      steps.flatMap(s => Seq(-3 * s - 1, -3 * s, -3 * s + 1, -1L, 0L, 1L, s - 1, s, s + 1))
    val df = ms.distinct.toDF("ms")
    for (step <- steps) {
      val got = df.select(col("ms"),
          expr(s"CAST(((ms) - pmod(ms, ${step}L)) DIV ${step}L AS BIGINT)").as("slot"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for ((m, slot) <- got)
        assert(slot == Math.floorDiv(m, step),
          s"step=$step ms=$m: got $slot, want ${Math.floorDiv(m, step)}")
    }
  }
}
