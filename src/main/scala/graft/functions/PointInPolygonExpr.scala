package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Codegen'd point-in-polygon containment — the (b)-tier upgrade of the
  * geofence predicate promised in SURVEY.md §7.5. Identical PNPOLY
  * arithmetic to [[GeoFunctions.containsPoint]] (asserted equal in
  * GeoSpec), but evaluated as a single static call inside whole-stage
  * codegen over Spark's native array format — no UDF boxing, no
  * Seq[Double] conversion per row. On a broadcast nested-loop join of a
  * 100 TB point stream against a fence table, the predicate is the
  * inner loop; this keeps it allocation-free.
  */
case class PointInPolygonExpr(lat: Expression, lng: Expression,
                              lats: Expression, lngs: Expression)
  extends QuaternaryExpression {

  override def first: Expression = lat
  override def second: Expression = lng
  override def third: Expression = lats
  override def fourth: Expression = lngs

  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains"

  override protected def nullSafeEval(latV: Any, lngV: Any,
                                      latsV: Any, lngsV: Any): Any =
    PointInPolygonExpr.contains(
      latV.asInstanceOf[Double], lngV.asInstanceOf[Double],
      latsV.asInstanceOf[ArrayData], lngsV.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.PointInPolygonExpr.contains($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PointInPolygonExpr =
    copy(lat = newFirst, lng = newSecond, lats = newThird, lngs = newFourth)
}

object PointInPolygonExpr {
  /** Same ray-cast parity test as [[GeoFunctions.containsPoint]], over
    * Spark's columnar array format (no boxing).
    */
  def contains(lat: Double, lng: Double,
               lats: ArrayData, lngs: ArrayData): Boolean = {
    val n = lats.numElements()
    var inside = false
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val aLat = lats.getDouble(i); val aLng = lngs.getDouble(i)
      val bLat = lats.getDouble(j); val bLng = lngs.getDouble(j)
      if (((aLat > lat) != (bLat > lat)) &&
          (lng < (bLng - aLng) * (lat - aLat) / (bLat - aLat) + aLng))
        inside = !inside
      i += 1
    }
    inside
  }

  def column(lat: Column, lng: Column, lats: Column, lngs: Column): Column =
    ColumnBridge.toColumn(PointInPolygonExpr(
      ColumnBridge.toExpression(lat), ColumnBridge.toExpression(lng),
      ColumnBridge.toExpression(lats), ColumnBridge.toExpression(lngs)))
}
