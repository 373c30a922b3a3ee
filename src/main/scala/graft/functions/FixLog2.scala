package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Cross-engine-exact fixed-point base-2 logarithm:
  * `L(n) = floor(2^16 · log2 n)` for integer n ≥ 1, computed by PURE
  * INTEGER arithmetic (16 squaring steps on a 62-bit fixed-point
  * mantissa) — no libm, so the JVM and DuckDB produce bit-identical
  * values and log-domain scores (Naive Bayes, DSIR importance weights)
  * can be hash-checked across engines. [[sqlL]] emits the same
  * algorithm as a DuckDB HUGEINT `list_reduce` fold.
  *
  * Derivation: with b = floor(log2 n) and m = n/2^b ∈ [1,2) held as
  * M = m·2^62, each step squares (M² = m²·2^124), emits the bit
  * [m² ≥ 2], and renormalizes (shift 63 when the bit is set, else 62).
  * The floor divisions lose low bits identically in both engines, so
  * the result is deterministic even where it differs from the true
  * rounded log in the last fractional bit.
  */
object FixLog2 {

  final val Scale = 16

  /** floor(2^16 · log2 n), driver-side (model tables are bounded). */
  def log2Fix16(n: Long): Long = {
    require(n >= 1, s"log2Fix16 needs n >= 1, got $n")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = BigInt(n) << (62 - b)
    val two125 = BigInt(1) << 125
    var acc = 0L
    var k = 0
    while (k < Scale) {
      val m2 = m * m
      if (m2 >= two125) { acc = acc * 2 + 1; m = m2 >> 63 }
      else { acc = acc * 2; m = m2 >> 62 }
      k += 1
    }
    (b.toLong << Scale) + acc
  }

  /** The identical algorithm as an inline DuckDB expression over a
    * BIGINT-valued SQL expression `e` (≥ 1). State packs (M, acc) into
    * one HUGEINT as M·2^16 + acc; `list_reduce`'s first element seeds
    * the fold, the 16 trailing 1s are step counters.
    */
  def sqlL(e: String): String =
    s"""((length(bin($e)) - 1) * 65536 + (list_reduce(
       |  list_concat([(CAST($e AS HUGEINT) << (62 - (length(bin($e)) - 1))) * 65536],
       |              list_transform(range(16), __x -> 1::HUGEINT)),
       |  (s, __x) -> CASE WHEN (s // 65536) * (s // 65536) >= (1::HUGEINT << 125)
       |      THEN (((s // 65536) * (s // 65536)) >> 63) * 65536 + (s % 65536) * 2 + 1
       |      ELSE (((s // 65536) * (s // 65536)) >> 62) * 65536 + (s % 65536) * 2 END
       |) % 65536))""".stripMargin

  /** [[log2Fix16]] as a per-row expression, for operators whose keys
    * need an exact log on DATA rows (weighted sampling), not just on a
    * bounded driver-side model table.
    */
  def log2Fix16Col(n: Column): Column = bridge.column(Log2Fix16Expr(bridge.expression(n)))
}

/** Per-row [[FixLog2.log2Fix16]]: floor(2^16 · log2 n) for a BIGINT
  * column with n ≥ 1 — same pure-integer squaring fold, bit-identical
  * to [[FixLog2.sqlL]]'s DuckDB HUGEINT emission.
  */
case class Log2Fix16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    FixLog2.log2Fix16(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Md5BucketDeltaSum(tokens)` — Σ over the token array of
  * `deltas[md5_number_lower(prefix ‖ token) mod deltas.length]`: the
  * whole per-document log-likelihood-ratio fold of a hashed-feature
  * count model (Naive Bayes / DSIR) as ONE scan-local expression.
  * The model (≤ a few thousand longs) rides in the plan as a literal;
  * classification is shuffle-free at any corpus size. Null array →
  * null; null tokens are skipped.
  */
case class Md5BucketDeltaSum(child: Expression, prefix: String, deltas: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val deltaArr: Array[Long] = deltas.toArray
  @transient private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val b = deltaArr.length.toLong
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val md = ArrayExprs.md5Digest()
        md.update(prefixBytes)
        md.update(arr.getUTF8String(i).getBytes)
        val h = ArrayExprs.md5Lower64(md)
        sum += deltaArr(java.lang.Long.remainderUnsigned(h, b).toInt)
      }
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5BucketDeltaSum {
  def apply(tokens: Column, prefix: String, deltas: Seq[Long]): Column =
    bridge.column(Md5BucketDeltaSum(bridge.expression(tokens), prefix, deltas))
}
