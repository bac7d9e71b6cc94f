package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity between two `array<double>` vectors.
  *
  * Bit-equal to [[VectorFunctions.cosine]] (asserted in SimilaritySpec):
  * three separate accumulators (dot, ‖a‖², ‖b‖²), each summed d
  * ascending with a single `+=` — the same order as the built-ins' left
  * fold and the DuckDB oracles' `sum(...)` over ordered d. The
  * higher-order-function form runs INTERPRETED (~13 µs/element), which
  * is fine for one query vector against the corpus but ruins the
  * multi-query recall audits (q84/q85: |Q|×|N| pairs — minutes instead
  * of seconds); this static call sits inside whole-stage codegen, the
  * (b) tier of the custom-operator preference order (SURVEY.md §7.5).
  */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineExpr.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineExpr.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {

  def cosine(a: ArrayData, b: ArrayData): Double = {
    // guard against a malformed row: score the common prefix instead of
    // throwing AIOOBE in an executor (embeddings are fixed-width, so the
    // path is defensive; the spec's bit-equality claim is for
    // equal-width input).
    // Elements are read straight off the ArrayData (an offset load on
    // UnsafeArrayData) instead of materializing toDoubleArray(): the
    // |Q|·|N| expansions evaluate this per PAIR, and two 512 B array
    // copies per call put ~1 KB × pairs of pure garbage on the heap —
    // at ×30 (400 M pairs) the allocation churn, not the FLOPs, was
    // the visible cost (r15 jstack). Accumulation order is unchanged
    // (d ascending, one += per accumulator), so results stay bit-equal.
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  // (n < max length leaves the trailing elements out of all three
  // sums — the same common-prefix semantics for both norms, so the
  // result is still a valid cosine of the truncated vectors)

  /** Column form: both sides must be `array<double>`. */
  def column(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      CosineExpr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
