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
  * w(j,d) = ((j*mulJ + d*mulD) % mod) - mod/2; band b's local bit k is
  * set iff dot(v, w_{b*bandBits+k}) > 0.
  *
  * Two weight families are in use:
  *  - (37, 101, 13) — the original near-dup family (q19/q20/q81). Its
  *    modulus caps the family at 13 DISTINCT hyperplanes (w is periodic
  *    in j with period 13), which is fine for near-dup candidate
  *    generation (near-identical vectors agree on almost every bit
  *    regardless) but fatal for moderate-similarity ANN retrieval —
  *    bits 13+ are exact copies of bits 0..12, so extra bands add
  *    correlation, not information. Kept for oracle/back-compat.
  *  - (1009, 31, 211) — the ANN family ([[graft.operators.SimilarityOp]]
  *    Ann* constants): up to 211 distinct hyperplanes, enough for the
  *    24-band × 8-bit multi-probe retrieval to hit recall ≥ 0.8.
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
case class SignSketchExpr(child: Expression, numBands: Int, bandBits: Int,
                          mulJ: Int = 37, mulD: Int = 101, mod: Int = 13)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch_bands"

  override protected def nullSafeEval(input: Any): Any =
    SignSketchExpr.sketch(input.asInstanceOf[ArrayData], numBands, bandBits,
      mulJ, mulD, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignSketchExpr.sketch($c, $numBands, $bandBits, " +
        s"$mulJ, $mulD, $mod)")

  override protected def withNewChildInternal(newChild: Expression): SignSketchExpr =
    copy(child = newChild)
}

object SignSketchExpr {

  /** All band values for one vector. Weights stay in integer arithmetic
    * until the single double multiply per (j, d) term — engine-portable.
    */
  def sketch(v: ArrayData, numBands: Int, bandBits: Int,
             mulJ: Int, mulD: Int, mod: Int): ArrayData =
    new GenericArrayData(
      sketchOf(v.toDoubleArray(), numBands, bandBits, mulJ, mulD, mod))

  /** Plain-Scala core — also used driver-side to sketch a collected
    * query vector (ANN candidate retrieval).
    */
  def sketchOf(v: Array[Double], numBands: Int, bandBits: Int,
               mulJ: Int = 37, mulD: Int = 101, mod: Int = 13): Array[Long] = {
    val n = v.length
    val half = mod / 2
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
          s += v(d) * (((j * mulJ + d * mulD) % mod) - half).toDouble
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
  def column(v: Column, numBands: Int, bandBits: Int,
             mulJ: Int = 37, mulD: Int = 101, mod: Int = 13): Column =
    ColumnBridge.toColumn(
      SignSketchExpr(ColumnBridge.toExpression(v), numBands, bandBits,
        mulJ, mulD, mod))
}
