package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd banded random-hyperplane sign sketch: one pass over an
  * `array<double>` vector computing ALL `numBands` band values
  * (`bandBits` bits each) of the cosine-LSH family defined in
  * [[VectorFunctions.signSketch]] — hyperplane j has integer weights
  * w(j,d) = ((j*37 + d*101) % 13) - 6; band b's local bit k is set iff
  * dot(v, w_{b*bandBits+k}) > 0.
  *
  * The composed-built-ins form costs numBands×bandBits separate
  * `aggregate(zip_with(...))` trees (64 interpreted higher-order folds
  * per row for 4×16 banding — measured 2.5× slowdown on q19/q20); this
  * is a tight j×d loop emitted inside whole-stage codegen via a static
  * call — the (b) tier of the custom-operator preference order
  * (SURVEY.md §7.5). Sum order (d ascending, += into one double) is
  * IDENTICAL to the built-ins' left fold and to the DuckDB oracle's
  * `sum(...)` over ordered d, so all three produce bit-equal sketches.
  */
case class SignSketchExpr(child: Expression, numBands: Int, bandBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch_bands"

  override protected def nullSafeEval(input: Any): Any =
    SignSketchExpr.sketch(input.asInstanceOf[ArrayData], numBands, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignSketchExpr.sketch($c, $numBands, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): SignSketchExpr =
    copy(child = newChild)
}

object SignSketchExpr {

  /** All band values for one vector. Weights stay in integer arithmetic
    * until the single double multiply per (j, d) term — engine-portable.
    */
  def sketch(v: ArrayData, numBands: Int, bandBits: Int): ArrayData =
    new GenericArrayData(sketchOf(v.toDoubleArray(), numBands, bandBits))

  /** Plain-Scala core — also used driver-side to sketch a collected
    * query vector (ANN candidate retrieval).
    */
  def sketchOf(v: Array[Double], numBands: Int, bandBits: Int): Array[Long] = {
    val n = v.length
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bval = 0L
      var k = 0
      while (k < bandBits) {
        val j = b * bandBits + k
        var s = 0.0
        var d = 0
        while (d < n) {
          s += v(d) * (((j * 37 + d * 101) % 13) - 6).toDouble
          d += 1
        }
        if (s > 0.0) bval |= (1L << k)
        k += 1
      }
      out(b) = bval
      b += 1
    }
    out
  }

  /** Column form: `v` must be `array<double>`. */
  def column(v: Column, numBands: Int, bandBits: Int): Column =
    ColumnBridge.toColumn(
      SignSketchExpr(ColumnBridge.toExpression(v), numBands, bandBits))
}
