package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (SURVEY.md §7.6):
  * tokenization, w-shingling, and an engine-portable string hash.
  *
  * The hash must produce IDENTICAL values in Spark and in the DuckDB
  * oracle, so it is defined as pure SQL-expressible arithmetic — a
  * base-131 polynomial over the first 8 character codes plus the length,
  * mod 1e9+7 — with a Column builder and a SQL-string builder generated
  * from the same recipe. All arithmetic is 64-bit (DuckDB INT32 literals
  * overflow on multiply; Spark 4 ANSI mode throws — hence explicit
  * longs/::BIGINT on both sides).
  */
object TextFunctions {

  val HashMod: Long = 1000000007L
  val HashBase: Long = 131L
  val HashPrefixLen: Int = 8

  /** Whitespace tokenization (the corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word w-shingles as space-joined strings; docs shorter than w words
    * yield an empty array. Delegates to the codegen'd [[ShinglesExpr]]
    * (one pass per row); the composed-built-ins formulation is kept in
    * [[shinglesBuiltins]] for cross-checking.
    */
  def shingles(toks: Column, w: Int = 3): Column =
    ShinglesExpr.column(toks, w)

  /** Same semantics from built-ins only (interpreted higher-order
    * transform) — retained for tests.
    */
  def shinglesBuiltins(toks: Column, w: Int = 3): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w), k =>
        concat_ws(" ", (0 until w).map(off => element_at(toks, k + off + 1)): _*)))
      .otherwise(array())

  /** Portable polynomial hash, Column form — delegates to the codegen'd
    * [[PortableHashExpr]] (one pass per row). The equivalent
    * composed-built-ins formulation is kept in [[portableHashBuiltins]]
    * for cross-checking.
    */
  def portableHash(s: Column): Column = PortableHashExpr.column(s)

  /** Same recipe from built-ins only (8× substring+ascii) — the slower
    * reference formulation, retained for tests.
    */
  def portableHashBuiltins(s: Column): Column = {
    val padded = rpad(s, HashPrefixLen, "#")
    val chars = (1 to HashPrefixLen)
      .map(k => ascii(substring(padded, k, 1)).cast("long"))
    val h = chars.foldLeft(lit(0L)) { (acc, a) =>
      (acc * HashBase + a) % HashMod
    }
    (h * HashBase + length(s).cast("long")) % HashMod
  }

  /** Portable polynomial hash, DuckDB SQL form — same recipe. `e` is a
    * SQL expression evaluating to VARCHAR.
    */
  def portableHashSql(e: String): String = {
    val padded = s"rpad($e, $HashPrefixLen, '#')"
    var h = "0::BIGINT"
    for (k <- 1 to HashPrefixLen)
      h = s"(($h * $HashBase + ascii(substr($padded, $k, 1))) % $HashMod)"
    s"(($h * $HashBase + length($e)) % $HashMod)"
  }

  /** MinHash permutation parameters — literal constants shared by the
    * Spark and SQL sides: h_i(x) = (a_i·x + b_i) mod p.
    */
  def permA(i: Int): Long = (1234567L + 2654435761L * i) % HashMod
  def permB(i: Int): Long = (987654321L + 40503L * i) % HashMod
}
