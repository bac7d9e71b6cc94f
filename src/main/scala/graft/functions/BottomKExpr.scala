package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable bounded bottom-k buffer: three parallel primitive arrays
  * kept sorted ascending by (hx, id), plus the fill count. All
  * mutation is binary-search + `System.arraycopy` shift — no boxing,
  * no per-accept structure rebuild. */
final class BottomKState(val k: Int) {
  var n: Int = 0
  val hx: Array[Long] = new Array[Long](k)
  val id: Array[Long] = new Array[Long](k)
  val v: Array[Double] = new Array[Double](k)
}

/** Native Catalyst form of [[BottomKAgg]] — same fold, same output
  * (`array<struct<hx,id,v>>` sorted asc by (hx, id), ≤ k rows), as a
  * [[TypedImperativeAggregate]] over primitive arrays.
  *
  * Why it exists (r15 measurement): the `udaf(Aggregator)` form keeps
  * its buffer as an immutable `Seq[SampleRow]`, so every ACCEPTED row
  * rebuilds a boxed k-element Vector — O(k) allocations per accept.
  * At serve k = 5 accepts are rare and the cost is invisible, but the
  * Hamming-shortlist folds run at c = 50/100 where the fill phase and
  * the long tie-heavy tail (65 distinct distances) accept constantly:
  * at ×30 (514 M sig pairs) q188's two shortlist folds dominated the
  * query at ~296 s steady. This form accepts with one arraycopy shift
  * and reads its three inputs straight off the row, and the
  * sorted-ascending buffer makes merge() early-exit the moment the
  * incoming partial can no longer contribute.
  *
  * Semantics are IDENTICAL to [[BottomKAgg]] (strict-less ordering on
  * (hx, id); a full buffer drops rows not strictly below its last
  * element; `distinctKeys` gives KMV set semantics) — asserted
  * element-for-element against the Aggregator across random seeds and
  * forced multi-partition merges in BottomKAggSpec.
  */
case class BottomKExpr(keyChild: Expression, idChild: Expression,
                       vChild: Expression, k: Int,
                       distinctKeys: Boolean = false,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKState]
    with ImplicitCastInputTypes {
  require(k >= 1 && k <= 65536, s"BottomKExpr: k=$k out of range")

  override def children: Seq[Expression] = Seq(keyChild, idChild, vChild)
  // Analysis-time contract (r16, ADVICE item): update() reads the
  // children as raw Long/Long/Double off the row. The udaf(Aggregator)
  // form this replaced coerced via the SampleRow encoder, so callers
  // could pass e.g. an INT id; declaring inputTypes restores that
  // tolerance through Catalyst's implicit casts instead of failing
  // with a runtime ClassCastException.
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(LongType, LongType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hx", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BottomKState = new BottomKState(k)

  @inline private def ltLast(b: BottomKState, h: Long, i: Long): Boolean = {
    val last = b.n - 1
    h < b.hx(last) || (h == b.hx(last) && i < b.id(last))
  }

  private def insert(b: BottomKState, h: Long, i: Long, value: Double): Unit = {
    if (b.n >= k && !ltLast(b, h, i)) return
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hx(mid) < h || (b.hx(mid) == h && b.id(mid) < i)) lo = mid + 1
      else hi = mid
    }
    if (distinctKeys && lo < b.n && b.hx(lo) == h && b.id(lo) == i) return
    val newN = math.min(b.n + 1, k)
    val m = newN - 1 - lo
    if (m > 0) {
      System.arraycopy(b.hx, lo, b.hx, lo + 1, m)
      System.arraycopy(b.id, lo, b.id, lo + 1, m)
      System.arraycopy(b.v, lo, b.v, lo + 1, m)
    }
    b.hx(lo) = h
    b.id(lo) = i
    b.v(lo) = value
    b.n = newN
  }

  override def update(b: BottomKState, input: InternalRow): BottomKState = {
    val kEv = keyChild.eval(input)
    val iEv = idChild.eval(input)
    if (kEv != null && iEv != null) {
      val vEv = vChild.eval(input)
      insert(b, kEv.asInstanceOf[Long], iEv.asInstanceOf[Long],
        if (vEv == null) 0d else vEv.asInstanceOf[Double])
    }
    b
  }

  override def merge(b: BottomKState, o: BottomKState): BottomKState = {
    // o is sorted ascending: once a row misses a full buffer, every
    // later row misses too
    var i = 0
    while (i < o.n) {
      if (b.n >= k && !ltLast(b, o.hx(i), o.id(i))) return b
      insert(b, o.hx(i), o.id(i), o.v(i))
      i += 1
    }
    b
  }

  override def eval(b: BottomKState): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](b.hx(i), b.id(i), b.v(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: BottomKState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.n * 24)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) {
      buf.putLong(b.hx(i)); buf.putLong(b.id(i)); buf.putDouble(b.v(i))
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKState = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new BottomKState(k)
    b.n = buf.getInt()
    var i = 0
    while (i < b.n) {
      b.hx(i) = buf.getLong(); b.id(i) = buf.getLong(); b.v(i) = buf.getDouble()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKExpr =
    copy(keyChild = newChildren(0), idChild = newChildren(1),
      vChild = newChildren(2))
  override def prettyName: String = "bottom_k"
}

object BottomKExpr {
  /** Column form, the drop-in for `udaf(new BottomKAgg(k))(c1,c2,c3)`. */
  def column(key: Column, id: Column, v: Column, k: Int,
             distinctKeys: Boolean = false): Column =
    ColumnBridge.toColumn(
      BottomKExpr(ColumnBridge.toExpression(key),
        ColumnBridge.toExpression(id), ColumnBridge.toExpression(v),
        k, distinctKeys).toAggregateExpression())
}
