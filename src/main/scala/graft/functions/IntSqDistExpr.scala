package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd EXACT-INTEGER squared L2 distance between two
  * `array<double>` vectors: each element is half-up scaled to an e6
  * integer (`floor(x·10⁶ + 0.5)` — the q62/q276/q278 idiom) and the
  * squared differences accumulate in a Java long, so the result is a
  * bit-exact integer in BOTH engines (the DuckDB twin sums
  * `(xa.x6 − xb.x6)²` over per-element scaled columns — same floor,
  * same integer arithmetic, no float summation order to diverge).
  *
  * [[L2Expr]]'s sibling for kernels that need PARITY-GRADE distances
  * rather than metric doubles: the k-center coreset (q278) ranks pool
  * points by distance and tie-breaks on equality, which a float kernel
  * cannot make engine-portable. Magnitude guard: |x| ≤ ~2 ⇒ per-term
  * diff² ≤ 1.6·10¹³, 64 terms ≤ ~10¹⁵ — inside both the long and the
  * 2⁵³ double window of the literal side.
  *
  * Sits inside whole-stage codegen (tier (b) of SURVEY §7.5) — the
  * higher-order `zip_with`/`aggregate` form runs interpreted at
  * ~13 µs/element, which ruins a kernel evaluated per
  * (pool vector × center × step).
  */
case class IntSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_sq_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntSqDistExpr.sqDist(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntSqDistExpr.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqDistExpr =
    copy(left = newLeft, right = newRight)
}

object IntSqDistExpr {

  /** Half-up e6 scaling — ONE definition of the float→int idiom, kept
    * identical to the SQL `CAST(floor(x * 1000000 + 0.5) AS BIGINT)`
    * both engines run. */
  def scale6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  def sqDist(a: ArrayData, b: ArrayData): Long = {
    // common-prefix guard + allocation-free element reads, the
    // CosineExpr conventions (same accumulation order → bit-equal)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = scale6(a.getDouble(i)) - scale6(b.getDouble(i))
      s += d * d
      i += 1
    }
    s
  }

  /** Column form: both sides must be `array<double>`. */
  def column(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      IntSqDistExpr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
