package graft.functions

import java.math.BigDecimal
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Order-independent EXACT sum of doubles — the hub-safe replacement for
  * the `aggregate(array_sort(collect_list(x)), 0.0, +)` sorted-fold
  * pattern ([[graft.ops.Graph]]).
  *
  * Every FINITE IEEE-754 double is exactly representable as a
  * finite-precision decimal, and `java.math.BigDecimal` addition is
  * exact, so the accumulated sum is the TRUE real-arithmetic sum
  * regardless of the order rows arrive or how partial buffers merge —
  * commutative, associative, deterministic under any Spark
  * partitioning. `eval` rounds ONCE to the nearest double
  * (correctly-rounded), so the result is at least as accurate as any
  * fold and never depends on shuffle nondeterminism.
  *
  * Non-finite inputs (NaN / ±Infinity) cannot live in a BigDecimal, so
  * the buffer carries them in a separate IEEE double slot that
  * accumulates with plain double addition — NaN is sticky and
  * `+Inf + -Inf = NaN`, exactly what SQL `SUM(double)` produces. Once
  * any non-finite value is seen the group's result is that slot
  * (adding any finite part to NaN/±Inf cannot change it), which is
  * still order-independent: IEEE addition restricted to {NaN, +Inf,
  * -Inf} is commutative and associative.
  *
  * Execution shape vs the sorted fold: a `TypedImperativeAggregate`
  * with an O(1)-size buffer (one BigDecimal) and map-side partial
  * aggregation — a group with 10^7 in-edges costs 10^7 buffer ADDS
  * spread across its input partitions, not one 10^7-element array in a
  * single task's aggregation buffer. This is the MinHashMerge pattern
  * ([[MinHashMerge]]) applied to float summation.
  *
  * Not bit-identical to the sorted fold in general (the fold rounds
  * after every add; this rounds once), so oracle rows that pin the fold
  * contract keep it; callers at web scale use this.
  */
case class ExactDoubleSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExactDoubleSum.Buf] {

  import ExactDoubleSum.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  // dec == null && nf == null = "no non-null input yet" (SQL SUM
  // semantics: empty group -> NULL); nf != null = a non-finite input
  // was seen and dominates the result.
  override def createAggregationBuffer(): Buf = new Buf(null, null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(x)) {
        val d = new BigDecimal(x) // exact binary->decimal
        buf.dec = if (buf.dec == null) d else buf.dec.add(d)
      } else {
        buf.nf = if (buf.nf == null) x else buf.nf + x
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.dec != null) b1.dec = if (b1.dec == null) b2.dec else b1.dec.add(b2.dec)
    if (b2.nf != null) b1.nf = if (b1.nf == null) b2.nf else b1.nf + b2.nf
    b1
  }

  override def eval(buf: Buf): Any =
    if (buf.nf != null) buf.nf.doubleValue()
    else if (buf.dec == null) null
    else buf.dec.doubleValue()

  // Wire format: [] = empty; 0x01 + 8-byte double = non-finite
  // (finite part dropped — it cannot affect the result); 0x00 +
  // 4-byte scale + unscaled bytes = finite exact sum.
  override def serialize(buf: Buf): Array[Byte] =
    if (buf.nf != null) {
      val bb = ByteBuffer.allocate(9)
      bb.put(1: Byte).putDouble(buf.nf.doubleValue())
      bb.array()
    } else if (buf.dec == null) Array.emptyByteArray
    else {
      val unscaled = buf.dec.unscaledValue().toByteArray
      val bb = ByteBuffer.allocate(5 + unscaled.length)
      bb.put(0: Byte).putInt(buf.dec.scale()).put(unscaled)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Buf =
    if (bytes.isEmpty) new Buf(null, null)
    else {
      val bb = ByteBuffer.wrap(bytes)
      if (bb.get() == (1: Byte)) new Buf(null, bb.getDouble)
      else {
        val scale = bb.getInt
        val unscaled = new Array[Byte](bytes.length - 5)
        bb.get(unscaled)
        new Buf(new BigDecimal(new java.math.BigInteger(unscaled), scale), null)
      }
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactDoubleSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactDoubleSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactDoubleSum {
  /** Mutable aggregation buffer: exact finite part + IEEE non-finite
    * part (null = none seen).
    */
  final class Buf(var dec: BigDecimal, var nf: java.lang.Double)

  def exactSum(x: Column): Column =
    bridge.column(ExactDoubleSum(bridge.expression(x)).toAggregateExpression())
}
