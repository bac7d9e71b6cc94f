package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}
import graft.functions.{PointInPolygonExpr, PortableHashExpr, ShinglesExpr, SignSketchExpr}

/** SQL surface for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT st_contains(lat, lng, lats, lngs) ...")` works.
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] for deploy time:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applies at session construction via `injectFunction`);
  *  - [[GraftFunctions.register]] for an already-running session
  *    (temp-function registry) — used by tests and notebooks.
  */
object GraftFunctions {

  // a wrong arg count must read as a usage error, not an internal
  // IndexOutOfBounds from the builder
  private def arity(args: Seq[Expression], ok: Range, usage: String): Unit =
    if (!ok.contains(args.length)) throw new IllegalArgumentException(
      s"$usage — got ${args.length} argument(s)")

  // SQL literals arrive as decimal/int — coerce explicitly (the
  // ImplicitCastInputTypes trait's AbstractDataType is private[sql]).
  private def hashBuilder(args: Seq[Expression]): Expression = {
    arity(args, 1 to 1, "portable_hash(str)")
    PortableHashExpr(Cast(args.head, StringType))
  }

  private def containsBuilder(args: Seq[Expression]): Expression = {
    arity(args, 4 to 4, "st_contains(lat, lng, lats, lngs)")
    PointInPolygonExpr(
      Cast(args(0), DoubleType), Cast(args(1), DoubleType),
      Cast(args(2), ArrayType(DoubleType)), Cast(args(3), ArrayType(DoubleType)))
  }

  // the size parameters must be foldable ints — they shape the codegen
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def shinglesBuilder(args: Seq[Expression]): Expression = {
    arity(args, 1 to 2, "shingles(tokens[, w])")
    ShinglesExpr(Cast(args.head, ArrayType(StringType)),
      if (args.length > 1) litInt(args(1), "shingle width") else 3)
  }

  private def signSketchBuilder(args: Seq[Expression]): Expression = {
    arity(args, 3 to 3, "sign_sketch(vec, numBands, bandBits)")
    SignSketchExpr(Cast(args.head, ArrayType(DoubleType)),
      litInt(args(1), "numBands"), litInt(args(2), "bandBits"))
  }

  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("portable_hash", hashBuilder _,
      "portable_hash(str) - engine-portable polynomial hash (base 131, mod 1e9+7)"),
    ("st_contains", containsBuilder _,
      "st_contains(lat, lng, lats, lngs) - PNPOLY point-in-polygon test"),
    ("shingles", shinglesBuilder _,
      "shingles(tokens[, w]) - w-gram shingles of a token array (default w=3)"),
    ("sign_sketch", signSketchBuilder _,
      "sign_sketch(vec, numBands, bandBits) - per-band hyperplane sign sketches"))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}
