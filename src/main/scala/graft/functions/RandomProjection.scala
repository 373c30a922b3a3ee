package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `RpProject(vec, dOut)` — Johnson–Lindenstrauss random projection with
  * hash-derived ±1 signs (Achlioptas, JCSS 2003: database-friendly
  * random projections — public): out[j] = Σᵢ s(j,i)·v[i] / √dOut with
  * s(j,i) = +1 iff md5_number_lower("rp:j:i") is even.
  *
  * The JL lemma guarantees pairwise distances survive within (1±ε) at
  * dOut = O(log N / ε²), independent of the input dimension — the
  * cheap pre-step that shrinks embedding bytes 2–4× before LSH/IVF/PQ
  * indexing at 100 TB. Deterministic signs mean NO projection-matrix
  * state to persist or ship: any executor (and the DuckDB oracle)
  * re-derives the matrix from the hash, the same trick as
  * [[ArrayExprs.LshBuckets]]' hyperplanes.
  *
  * Scan-local: D·dOut multiply-adds per row, zero shuffles. The sign
  * matrix is derived once per task (transient cache), not per row.
  * Accumulation is the left-to-right i-fold in double — bit-identical
  * to the oracle's `list_sum(list_transform(...))`; the √dOut division
  * happens once at the end (both engines' IEEE sqrt is correctly
  * rounded, so cross-engine results match exactly).
  */
case class RpProject(child: Expression, dOut: Int)
    extends UnaryExpression with CodegenFallback {
  require(dOut > 0, s"RpProject: dOut must be positive, got $dOut")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // Sign matrix pinned to the FIRST observed input dimension: a mixed-
  // dimension embedding column is corrupt data, and silently re-deriving
  // the matrix per dimension flip would both hide that and cost
  // O(D·dOut) hashing per alternating row — throw instead.
  //
  // The "not yet derived" sentinel is `signs == null`, NOT a cachedDim
  // sentinel value: both fields are @transient, and a Java-serialization
  // round-trip (executor task binaries on a real cluster) resets an Int
  // to 0 and a reference to null. Keying on cachedDim == -1 made every
  // deserialized copy take the dimension-changed branch on valid data.
  @transient private var cachedDim: Int = -1
  @transient private var signs: Array[Array[Boolean]] = _ // [j][i] = positive?

  private def signMatrix(dim: Int): Array[Array[Boolean]] = {
    if (signs == null) {
      signs = Array.tabulate(dOut) { j =>
        Array.tabulate(dim) { i =>
          val h = ArrayExprs.md5Lower64(s"rp:$j:$i".getBytes("UTF-8"))
          java.lang.Long.remainderUnsigned(h, 2L) == 0L
        }
      }
      cachedDim = dim
    } else if (cachedDim != dim) {
      throw new IllegalStateException(
        s"RpProject: input dimension changed from $cachedDim to $dim — " +
          "the embedding column mixes vector dimensions")
    }
    signs
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val s = signMatrix(dim)
    val scale = math.sqrt(dOut.toDouble)
    val out = new Array[Any](dOut)
    var j = 0
    while (j < dOut) {
      val row = s(j)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = v.getFloat(i).toDouble
        acc += (if (row(i)) x else -x)
        i += 1
      }
      out(j) = acc / scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjection {
  def rpProject(vec: Column, dOut: Int): Column =
    bridge.column(RpProject(bridge.expression(vec), dOut))
}
