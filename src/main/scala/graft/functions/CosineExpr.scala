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
    val av = a.toDoubleArray()
    val bv = b.toDoubleArray()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < av.length) {
      dot += av(i) * bv(i)
      na += av(i) * av(i)
      nb += bv(i) * bv(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column form: both sides must be `array<double>`. */
  def column(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      CosineExpr(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
