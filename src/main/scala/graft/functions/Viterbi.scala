package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ViterbiPieces(word, vocab)` — optimal unigram-LM segmentation
  * (the Viterbi half of Kudo 2018's unigram tokenizer — public): split
  * the word into vocabulary pieces maximizing the total piece score,
  * ties broken toward FEWER pieces. Scores are the integer fixed-point
  * log-frequencies ([[FixLog2]]), so the whole DP is integer arithmetic
  * and the DuckDB twin (an unrolled per-position max, see
  * [[graft.ops.Subword.unigramViterbiSql]]) replays it exactly.
  *
  * The lexicographic objective (max Σscore, then min pieces) is packed
  * into one long per DP state: each consumed piece adds
  * `score·64 − 1`, so totals order by Σscore first (scores are
  * integers, so any score difference shifts the packed value by ≥ 64)
  * and by −n within equal scores (n < 64 enforced). `n` and `Σscore`
  * unpack from the final value with the same truncated-division
  * arithmetic in both engines.
  *
  * Returns `struct<n_pieces: int, sum_score: bigint>`; the -1/-1
  * sentinel marks an unreachable position (impossible under the
  * all-single-codepoints vocab contract — and the oracle twin drops
  * such words, turning drift into a loud row-count mismatch).
  */
case class ViterbiPieces(child: Expression, vocab: Map[String, Long])
    extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty, "ViterbiPieces: vocab must be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("sum_score", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  @transient private lazy val maxPieceCp: Int =
    vocab.keys.map(p => p.codePointCount(0, p.length)).max

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return InternalRow(0, 0L)
    if (n >= 64) return InternalRow(-1, -1L) // packing bound; see scaladoc
    val NEG = Long.MinValue
    val best = Array.fill(n + 1)(NEG)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = 1
      val jMax = math.min(maxPieceCp, i)
      while (j <= jMax) {
        if (best(i - j) != NEG) {
          val piece = new String(cps, i - j, j)
          vocab.get(piece) match {
            case Some(score) =>
              val cand = best(i - j) + score * 64L - 1L
              if (cand > best(i)) best(i) = cand
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == NEG) return InternalRow(-1, -1L)
    val packed = best(n)
    val nPieces = (64L - (((packed % 64L) + 64L) % 64L)) % 64L
    val sumScore = (packed + nPieces) / 64L
    InternalRow(nPieces.toInt, sumScore)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Viterbi {
  def viterbiPieces(word: Column, vocab: Map[String, Long]): Column =
    bridge.column(ViterbiPieces(bridge.expression(word), vocab))
}
