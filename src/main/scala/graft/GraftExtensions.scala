package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import graft.functions.{PointInPolygonExpr, PortableHashExpr}

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

  // SQL literals arrive as decimal/int — coerce explicitly (the
  // ImplicitCastInputTypes trait's AbstractDataType is private[sql]).
  private def hashBuilder(args: Seq[Expression]): Expression =
    PortableHashExpr(Cast(args.head, StringType))

  private def containsBuilder(args: Seq[Expression]): Expression =
    PointInPolygonExpr(
      Cast(args(0), DoubleType), Cast(args(1), DoubleType),
      Cast(args(2), ArrayType(DoubleType)), Cast(args(3), ArrayType(DoubleType)))

  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("portable_hash", hashBuilder _,
      "portable_hash(str) - engine-portable polynomial hash (base 131, mod 1e9+7)"),
    ("st_contains", containsBuilder _,
      "st_contains(lat, lng, lats, lngs) - PNPOLY point-in-polygon test"))

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
