package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic decimal averages for cross-engine oracle parity.
  *
  * Two engine divergences make `round(avg(x), s)` over decimal data a
  * coin flip:
  *  1. summation order: float sums differ at the last ulp, flipping
  *     values that sit on a rounding boundary — and means of 2-decimal
  *     data sit on boundaries OFTEN (they are small-denominator
  *     rationals);
  *  2. round() semantics on the SAME double: Spark rounds the shortest
  *     decimal representation (`BigDecimal.valueOf`), DuckDB rounds the
  *     true binary value — 38.37874999…96 rounds to 38.3788 in Spark
  *     and 38.3787 in DuckDB.
  *
  * Fix: no float rounding at all. Sum exact scaled integers (2-decimal
  * data ×100 is exactly integral), do half-up division in integer
  * arithmetic, and only then convert to double — both engines produce
  * the IDENTICAL integer, hence the identical double.
  */
object DetAgg {

  /** Round-half-up of num/den in exact integer math (floor-division
    * identity: (2·num + den) div (2·den)); for negative numerators this
    * is half-toward-+∞ — identical in both engines either way, which is
    * what parity needs.
    */
  def halfUpDiv(num: Column, den: Column): Column = {
    val x = num * 2 + den
    val d = den * 2
    // IntegralDivide keeps the whole computation in long arithmetic.
    // (Column `/` would divide as doubles, which stops being exact past
    // 2^53 — fatal for the parity guarantee at large scale factors.)
    // x − pmod(x, d) is an exact multiple of d, so truncating division
    // IS floor division here regardless of sign.
    call_function("div", x - pmod(x, d), d)
  }

  /** SQL twin of [[halfUpDiv]] that is safe for NEGATIVE numerators:
    * DuckDB's `//` truncates toward zero (−7 // 2 = −3), so the same
    * `x − pmod(x, d)` floor-division identity is spelled out. (The
    * other *Sql helpers sum non-negative quantities and keep the plain
    * `//` form.)
    */
  def halfUpDivSql(numE: String, denE: String): String = {
    val x = s"(CAST($numE AS BIGINT) * 2 + CAST($denE AS BIGINT))"
    val d = s"(CAST($denE AS BIGINT) * 2)"
    s"(($x - ((($x % $d) + $d) % $d)) // $d)"
  }

  /** [[halfUpDivSql]] computed in int128: for numerators that pass 2⁶³
    * (the q199 variance-numerator class, mirrored by DECIMAL(38,0) on
    * the Spark side). The quotient is expected small (ppm-sized), so
    * the result casts back to BIGINT — loudly, if that expectation is
    * ever violated.
    */
  def halfUpDivHugeSql(numE: String, denE: String): String = {
    val x = s"(CAST($numE AS HUGEINT) * 2 + CAST($denE AS HUGEINT))"
    val d = s"(CAST($denE AS HUGEINT) * 2)"
    s"CAST((($x - ((($x % $d) + $d) % $d)) // $d) AS BIGINT)"
  }

  private def pow10(n: Int): Long = math.pow(10, n).toLong

  /** Mean of 2-decimal data, `scale` output decimals. */
  def avgCents2(c: Column, scale: Int = 4): Column = {
    val a = sum(round(c * 100).cast("long")) * pow10(scale - 2)
    halfUpDiv(a, count(lit(1))).cast("double") / pow10(scale).toDouble
  }

  def avgCents2Sql(e: String, scale: Int = 4): String = {
    val up = pow10(scale - 2)
    s"(CAST((sum(CAST(round(($e) * 100) AS BIGINT)) * $up * 2 + count(*)) " +
      s"// (count(*) * 2) AS DOUBLE) / ${pow10(scale)}.0)"
  }

  /** Mean of integral data, `scale` output decimals. */
  def avgInt(c: Column, scale: Int = 4): Column = {
    val a = sum(c.cast("long")) * pow10(scale)
    halfUpDiv(a, count(lit(1))).cast("double") / pow10(scale).toDouble
  }

  def avgIntSql(e: String, scale: Int = 4): String =
    s"(CAST((sum(CAST($e AS BIGINT)) * ${pow10(scale)} * 2 + count(*)) " +
      s"// (count(*) * 2) AS DOUBLE) / ${pow10(scale)}.0)"

  /** Exact `sum(p · (1−d))` of 2-decimal price × 2-decimal discount,
    * output 2dp. The products are 4-decimal rationals whose sums DO sit
    * exactly on 0.005 rounding boundaries (unlike plain 2-decimal sums,
    * which are always 0.005-safe) — so they get the integer treatment:
    * cents × (100−disc-cents) is an exact integer in 1e-4 units.
    */
  def sumDiscounted2(p: Column, d: Column): Column = {
    val s = sum(round(p * 100).cast("long")
      * (lit(100L) - round(d * 100).cast("long")))
    halfUpDiv(s, lit(100L)).cast("double") / 100.0
  }

  def sumDiscounted2Sql(pE: String, dE: String): String =
    s"(CAST((sum(CAST(round(($pE) * 100) AS BIGINT) " +
      s"* (100 - CAST(round(($dE) * 100) AS BIGINT))) * 2 + 100) " +
      s"// 200 AS DOUBLE) / 100.0)"

  /** Exact ratio of two integer columns (e.g. jaccard = inter/union,
    * stopword ratio = hits/tokens) — integer/integer rationals hit
    * rounding boundaries just like decimal means do.
    */
  def ratio(num: Column, den: Column, scale: Int = 4): Column =
    halfUpDiv(num.cast("long") * pow10(scale), den.cast("long"))
      .cast("double") / pow10(scale).toDouble

  def ratioSql(numE: String, denE: String, scale: Int = 4): String =
    s"(CAST((CAST($numE AS BIGINT) * ${pow10(scale)} * 2 + CAST($denE AS BIGINT)) " +
      s"// (CAST($denE AS BIGINT) * 2) AS DOUBLE) / ${pow10(scale)}.0)"

  /** Conditional (pivot-cell) variant; null when no rows match. */
  def avgCents2When(c: Column, cond: Column, scale: Int = 4): Column = {
    val a = sum(when(cond, round(c * 100).cast("long"))) * pow10(scale - 2)
    val n = sum(when(cond, 1L))
    halfUpDiv(a, n).cast("double") / pow10(scale).toDouble
  }

  def avgCents2WhenSql(e: String, condSql: String, scale: Int = 4): String = {
    val up = pow10(scale - 2)
    s"(CAST((sum(CASE WHEN $condSql THEN CAST(round(($e) * 100) AS BIGINT) END) " +
      s"* $up * 2 + sum(CASE WHEN $condSql THEN 1 END)) " +
      s"// (sum(CASE WHEN $condSql THEN 1 END) * 2) AS DOUBLE) / ${pow10(scale)}.0)"
  }

  /** Pearson correlation in fixed-point ppm from EXACT integer moment
    * sums (n, Σx, Σy, Σx², Σy², Σxy). Both engines feed identical
    * integers into an identical scalar double expression, and every
    * operator in it (·, −, /, sqrt, floor) is IEEE-correctly-rounded —
    * so the result is bit-equal cross-engine with no float-SUM
    * fold-order hazard (only float AGGREGATION leaks order; log/pow
    * would NOT be safe, they are libm-dependent). NULL when either
    * variance is zero.
    */
  def corrPpm(n: Column, sx: Column, sy: Column,
              sxx: Column, syy: Column, sxy: Column): Column = {
    val nd = n.cast("double")
    val num = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
    val d1 = nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    val d2 = nd * syy.cast("double") - sy.cast("double") * sy.cast("double")
    when(d1 > 0.0 && d2 > 0.0,
      floor(num / sqrt(d1 * d2) * lit(1000000.0) + lit(0.5)).cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  /** SQL twin of [[corrPpm]] — operator for operator. The moment
    * expressions must already be BIGINT columns/aliases. */
  def corrPpmSql(n: String, sx: String, sy: String,
                 sxx: String, syy: String, sxy: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val num = s"(${d(n)} * ${d(sxy)} - ${d(sx)} * ${d(sy)})"
    val d1 = s"(${d(n)} * ${d(sxx)} - ${d(sx)} * ${d(sx)})"
    val d2 = s"(${d(n)} * ${d(syy)} - ${d(sy)} * ${d(sy)})"
    s"""CASE WHEN $d1 > 0.0 AND $d2 > 0.0
       |  THEN CAST(floor($num / sqrt($d1 * $d2) * 1000000.0 + 0.5) AS BIGINT)
       |  ELSE NULL END""".stripMargin
  }
}
