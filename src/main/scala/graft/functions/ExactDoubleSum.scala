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
  * Every IEEE-754 double is exactly representable as a finite-precision
  * decimal, and `java.math.BigDecimal` addition is exact, so the
  * accumulated sum is the TRUE real-arithmetic sum regardless of the
  * order rows arrive or how partial buffers merge — commutative,
  * associative, deterministic under any Spark partitioning. `eval`
  * rounds ONCE to the nearest double (correctly-rounded), so the result
  * is at least as accurate as any fold and never depends on shuffle
  * nondeterminism.
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
  extends TypedImperativeAggregate[Array[BigDecimal]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  // 1-element array so update/merge can mutate in place; null slot =
  // "no non-null input yet" (SQL SUM semantics: empty group -> NULL)
  override def createAggregationBuffer(): Array[BigDecimal] = Array(null)

  override def update(buf: Array[BigDecimal], input: InternalRow): Array[BigDecimal] = {
    val v = child.eval(input)
    if (v != null) {
      val d = new BigDecimal(v.asInstanceOf[Double]) // exact binary->decimal
      buf(0) = if (buf(0) == null) d else buf(0).add(d)
    }
    buf
  }

  override def merge(b1: Array[BigDecimal], b2: Array[BigDecimal]): Array[BigDecimal] = {
    if (b2(0) != null) b1(0) = if (b1(0) == null) b2(0) else b1(0).add(b2(0))
    b1
  }

  override def eval(buf: Array[BigDecimal]): Any =
    if (buf(0) == null) null else buf(0).doubleValue()

  override def serialize(buf: Array[BigDecimal]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray
    else {
      val unscaled = buf(0).unscaledValue().toByteArray
      val bb = ByteBuffer.allocate(4 + unscaled.length)
      bb.putInt(buf(0).scale()).put(unscaled)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[BigDecimal] =
    if (bytes.isEmpty) Array(null)
    else {
      val bb = ByteBuffer.wrap(bytes)
      val scale = bb.getInt
      val unscaled = new Array[Byte](bytes.length - 4)
      bb.get(unscaled)
      Array(new BigDecimal(new java.math.BigInteger(unscaled), scale))
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
  def exactSum(x: Column): Column =
    bridge.column(ExactDoubleSum(bridge.expression(x)).toAggregateExpression())
}
