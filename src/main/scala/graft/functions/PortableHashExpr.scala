package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression for the engine-portable polynomial
  * string hash (same recipe as [[TextFunctions.portableHash]] /
  * [[TextFunctions.portableHashSql]], verified equal in
  * DedupAndTextSpec): base-131 over the first 8 character codes
  * ('#'-padded) plus the length, mod 1e9+7.
  *
  * The composed-built-ins form needs 8 `substring`+`ascii` expression
  * nodes and an `rpad` allocation per row; this is one pass over the
  * string, emitted inside whole-stage codegen via a static call — the
  * (b) tier of the custom-operator preference order (SURVEY.md §7.5).
  */
case class PortableHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash"

  override protected def nullSafeEval(input: Any): Any =
    PortableHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}

object PortableHashExpr {
  /** One-pass hash over the decoded string. `charAt` code units match
    * SQL `ascii(substr(...))` code points for all BMP text (the corpus
    * is ASCII).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var h = 0L
    var k = 0
    while (k < 8) {
      val c: Long = if (k < n) str.charAt(k).toLong else 35L // '#'
      h = (h * 131L + c) % 1000000007L
      k += 1
    }
    (h * 131L + n) % 1000000007L
  }

  def column(c: Column): Column =
    ColumnBridge.toColumn(PortableHashExpr(ColumnBridge.toExpression(c)))
}
