package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd euclidean (L2) distance between two `array<double>`
  * vectors — [[CosineExpr]]'s sibling for the distance-based kernels.
  *
  * Bit-equal to [[VectorFunctions.l2]] (asserted in SimilaritySpec):
  * one accumulator summed d ascending with a single `+=` — the same
  * order as the built-ins' left fold and the DuckDB oracles'
  * `sum((a-b)*(a-b))` — then one sqrt. The higher-order-function form
  * runs INTERPRETED (~13 µs/element), which ruins kernels evaluated
  * per (vector × centroid × subspace) — the PQ assignment in
  * q108/q123/q126 evaluates 64 sub-distances per vector; this static
  * call sits inside whole-stage codegen (the (b) tier of the
  * custom-operator preference order, SURVEY.md §7.5).
  */
case class L2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2Expr.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.L2Expr.l2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Expr =
    copy(left = newLeft, right = newRight)
}

object L2Expr {

  def l2(a: ArrayData, b: ArrayData): Double = {
    // common-prefix guard + allocation-free element reads, the
    // CosineExpr conventions (same accumulation order → bit-equal)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Column form: both sides must be `array<double>`. */
  def column(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      L2Expr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
