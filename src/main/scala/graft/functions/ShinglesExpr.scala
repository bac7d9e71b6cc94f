package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word w-shingling: `array<string>` tokens → `array<string>`
  * of space-joined w-grams, one pass, byte-level `UTF8String` concat.
  *
  * Semantics are identical to the composed-built-ins form
  * ([[TextFunctions.shinglesBuiltins]]: `transform(sequence(...),
  * concat_ws(element_at...))`, asserted equal in DedupAndTextSpec) —
  * but higher-order functions run interpreted per element, which made
  * shingling the dominant cost of the n-gram dedup tier (~13 µs per
  * shingle at sf0.1). This loop is emitted inside whole-stage codegen
  * via a static call — the (b) tier of the custom-operator preference
  * order (SURVEY.md §7.5). Docs shorter than w tokens yield an empty
  * array, like the built-ins form. One deliberate divergence: a NULL
  * token array yields NULL here (standard unary-expression null
  * propagation) where the built-ins form yields an empty array; every
  * in-repo caller tokenizes a non-null text column and then explodes,
  * so the two are runtime-equal (asserted null-safely in
  * DedupAndTextSpec).
  */
case class ShinglesExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.shingle(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglesExpr.shingle($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Space = UTF8String.fromString(" ")

  def shingle(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var k = 0
    while (k <= n - w) {
      val parts = new Array[UTF8String](w)
      var i = 0
      while (i < w) { parts(i) = toks.getUTF8String(k + i); i += 1 }
      // concatWs skips nulls — same as the built-ins' concat_ws
      out(k) = UTF8String.concatWs(Space, parts: _*)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column form: `toks` must be `array<string>`. */
  def column(toks: Column, w: Int): Column =
    ColumnBridge.toColumn(ShinglesExpr(ColumnBridge.toExpression(toks), w))
}
