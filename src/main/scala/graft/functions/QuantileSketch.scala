package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Mergeable one-pass quantile sketch: a KLL-style compactor hierarchy
  * (Karnin, Lang & Liberty 2016) with HASH-DERANDOMIZED compaction.
  *
  * Structure is KLL's: the sketch holds a sample at level L where every
  * retained row represents weight 2^L; when the sample exceeds `cap`,
  * it compacts — promotes to level L+1, keeping half the rows. The one
  * deviation is WHICH half survives. KLL keeps alternate ranks under a
  * random coin; any deterministic replay of that coin makes the output
  * depend on the merge-tree shape, which Spark does not fix (partial
  * aggregates form per input split, combine in arrival order), so a
  * rank-parity compactor can never hash-match a replayed twin. Here a
  * row survives to level l iff its id-hash has ≥ l trailing zero bits
  * (the adaptive hash sampling of Gibbons' distinct sampling / Flajolet
  * 1990) — survivorship is a property of the ROW, not of its rank in a
  * buffer, which makes the sketch a canonical SET function:
  *
  *   level  = min { l : |{rows : tz(h) ≥ l}| ≤ cap }
  *   sample = every row with tz(h) ≥ level
  *
  * independent of partitioning, arrival order, and merge-tree shape
  * (each increment through level l is justified only when some buffer —
  * hence the whole group — holds > cap rows at l; conversely the final
  * buffer holds exactly the global level-qualified set). SketchesSpec
  * pins this: any repartitioning produces the identical sketch, and the
  * DuckDB oracle twin recomputes it in closed form — a full hash match,
  * not a tolerance check.
  *
  * The price of derandomization: survivors form a Bernoulli(2^-L)
  * sample rather than KLL's stratified alternation, so rank error is
  * the uniform-sampling O(n/√cap) rather than KLL's compounded-variance
  * bound — the same order as KLL's top compactor alone. The purchase:
  * bit-reproducibility across engines and runs, and merge = filter +
  * concat (associative, commutative), the property that lets partial
  * sketches combine map-side with a ≤ cap-row buffer at any scale.
  *
  * Everything is integer-deterministic: trailing-zero levels, exact row
  * counts, and integer target-rank arithmetic; data values are only
  * ever compared and selected, never averaged, so quantile estimates
  * are actual data points and cross-engine exact.
  *
  * Buffer: (level, n, ≤ cap (tz, value) pairs) — O(cap) memory per
  * group per map partition regardless of input size, the
  * `TypedImperativeAggregate` shape of Spark's own HLL++ sketch (and of
  * [[MinHashMerge]]).
  */
case class HashLevelKll(
    value: Expression,
    tz: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.QsBuffer] {

  require(cap >= 2, s"cap must be >= 2, got $cap")

  override def children: Seq[Expression] = Seq(value, tz)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sample", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): QuantileSketch.QsBuffer =
    new QuantileSketch.QsBuffer(cap)

  override def update(buf: QuantileSketch.QsBuffer, input: InternalRow): QuantileSketch.QsBuffer = {
    val v = value.eval(input)
    val t = tz.eval(input)
    if (v != null && t != null)
      buf.insert(t.asInstanceOf[Int], v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: QuantileSketch.QsBuffer, b2: QuantileSketch.QsBuffer): QuantileSketch.QsBuffer = {
    b1.mergeIn(b2)
    b1
  }

  /** Sample emitted as the sorted value multiset: selection by order
    * statistic is then identical to the twin's `row_number() OVER
    * (ORDER BY value)` pick whatever order rows arrived in.
    */
  override def eval(buf: QuantileSketch.QsBuffer): Any = {
    val vals = java.util.Arrays.copyOf(buf.vals, buf.size)
    java.util.Arrays.sort(vals)
    InternalRow(buf.level, buf.n, new GenericArrayData(vals))
  }

  override def serialize(buf: QuantileSketch.QsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buf.size * 12)
    bb.putInt(buf.level); bb.putLong(buf.n); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putInt(buf.tzs(i)); bb.putDouble(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch.QsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QuantileSketch.QsBuffer(cap)
    buf.level = bb.getInt; buf.n = bb.getLong
    val sz = bb.getInt
    var i = 0
    while (i < sz) {
      val t = bb.getInt; val v = bb.getDouble
      buf.append(t, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashLevelKll =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashLevelKll =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), tz = newChildren(1))
}

object QuantileSketch {

  /** Mutable aggregation state: current level, exact row count, and the
    * level-qualified (tz, value) pairs. Arrays grow to at most cap + 1
    * before a compaction sweep restores size ≤ cap.
    */
  final class QsBuffer(cap: Int) {
    var level: Int = 0
    var n: Long = 0L
    var size: Int = 0
    var tzs: Array[Int] = new Array[Int](math.min(cap + 1, 64))
    var vals: Array[Double] = new Array[Double](math.min(cap + 1, 64))

    private def ensure(extra: Int): Unit = {
      if (size + extra > tzs.length) {
        val want = math.max(size + extra, tzs.length * 2)
        tzs = java.util.Arrays.copyOf(tzs, want)
        vals = java.util.Arrays.copyOf(vals, want)
      }
    }

    private[functions] def append(t: Int, v: Double): Unit = {
      ensure(1)
      tzs(size) = t; vals(size) = v; size += 1
    }

    /** Drop rows no longer level-qualified, in place. */
    private def retain(): Unit = {
      var w = 0
      var i = 0
      while (i < size) {
        if (tzs(i) >= level) { tzs(w) = tzs(i); vals(w) = vals(i); w += 1 }
        i += 1
      }
      size = w
    }

    /** Compact until within cap: each step promotes one level and keeps
      * the rows whose hash carries one more trailing zero bit — the
      * hash-derandomized KLL compaction. Terminates: tz inputs are
      * capped (≤ 62), so a high enough level empties the buffer.
      */
    private def compact(): Unit =
      while (size > cap) { level += 1; retain() }

    def insert(t: Int, v: Double): Unit = {
      n += 1
      if (t >= level) { append(t, v); compact() }
    }

    def mergeIn(other: QsBuffer): Unit = {
      n += other.n
      if (other.level > level) { level = other.level; retain() }
      ensure(other.size)
      var i = 0
      while (i < other.size) {
        if (other.tzs(i) >= level) { tzs(size) = other.tzs(i); vals(size) = other.vals(i); size += 1 }
        i += 1
      }
      compact()
    }
  }

  /** struct(level, n, sample) — the sketch of `value` rows, levels from
    * the precomputed `tz` column (trailing zeros of the row's id-hash,
    * see [[graft.ops.Sketches.quantileSketchAt]] for the shared hash
    * derivation the DuckDB twin replays).
    */
  def hashLevelKll(value: Column, tz: Column, cap: Int): Column =
    bridge.column(HashLevelKll(bridge.expression(value),
      bridge.expression(tz), cap).toAggregateExpression())
}
