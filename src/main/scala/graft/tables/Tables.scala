package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take `(SparkSession, sfDir)` and read through here so the
  * scan layer stays in one place: parquet → vectorized columnar read with
  * predicate pushdown + column pruning handled by Catalyst. At cluster
  * scale these would be partitioned/bucketed table reads; the API is the
  * same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize one timestamp-family column to canonical TimestampType
    * (see [[events]] for the full physical-type history). NTZ→cast is
    * instant-preserving under the UTC session timezone; nanos-as-long
    * floor-divides to micros.
    */
  private def normTs(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normTs(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normTs(table(s, d, "lineitem"), "l_shipdate")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    * timestamp[us] (isAdjustedToUTC=false → Spark 4 TIMESTAMP_NTZ) across
    * testdata generations. Normalize every variant to a microsecond
    * TimestampType so downstream `unix_millis`/`window()` always analyze:
    *  - NANOS → raw nanos via the legacy flag, floor-divide to micros
    *    (the same truncation DuckDB applies, so both engines see
    *    identical instants);
    *  - TIMESTAMP_NTZ → cast to TimestampType, instant-preserving under
    *    the UTC session timezone forced in build.sbt and every harness
    *    (DuckDB also treats the naive timestamp as UTC → epoch_ms parity);
    *  - TimestampType → already canonical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normTs(table(s, d, "events"), "ts")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
