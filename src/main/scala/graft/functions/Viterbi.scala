package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ViterbiPieces(word, vocab)` — optimal unigram-LM segmentation
  * (the Viterbi half of Kudo 2018's unigram tokenizer — public): split
  * the word into vocabulary pieces maximizing the total piece score,
  * ties broken toward FEWER pieces. Scores are the integer fixed-point
  * log-frequencies ([[FixLog2]]), so the whole DP is integer arithmetic
  * and the DuckDB twin (an unrolled per-position max, see
  * [[graft.ops.Subword.unigramViterbiSql]]) replays it exactly —
  * INCLUDING the ≥ 64-codepoint window split below: the twin pre-splits
  * every word into the same [[Viterbi.WindowCp]]-codepoint windows and
  * unrolls the DP to that bound, so long words verify against the
  * oracle instead of falling outside its domain.
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
  *
  * Words of ≥ 64 codepoints (URLs, base64 runs — real in web corpora)
  * exceed the per-word packing bound, so they are segmented in
  * ≤ 63-codepoint windows: the DP runs per window (each window's piece
  * count stays < 64, keeping the packing exact) and `n_pieces` /
  * `sum_score` accumulate across windows in plain integers. Pieces
  * cannot straddle a window boundary — a bounded, deterministic
  * approximation for the long-word tail rather than a silent -1
  * corrupting per-source totals.
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

  /** DP over one ≤ 63-codepoint window; returns (n_pieces, sum_score)
    * or null when some position is unreachable.
    */
  private def segmentWindow(cps: Array[Int], off: Int, n: Int): (Long, Long) = {
    val best = Viterbi.windowBest(cps, off, n, vocab, maxPieceCp)
    if (best(n) == Viterbi.NEG) return null
    val packed = best(n)
    val nPieces = (64L - (((packed % 64L) + 64L) % 64L)) % 64L
    val sumScore = (packed + nPieces) / 64L
    (nPieces, sumScore)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return InternalRow(0, 0L)
    var off = 0
    var totPieces = 0L
    var totScore = 0L
    while (off < n) {
      val win = math.min(Viterbi.WindowCp, n - off)
      val res = segmentWindow(cps, off, win)
      if (res == null) return InternalRow(-1, -1L)
      totPieces += res._1
      totScore += res._2
      off += win
    }
    InternalRow(totPieces.toInt, totScore)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ViterbiSegmentPieces(word, vocab)` — the PIECES of the optimal
  * unigram segmentation, as `array<string>`: the same windowed DP as
  * [[ViterbiPieces]] plus a deterministic backwalk — at each reachable
  * end position, consume the SHORTEST piece length that attains the
  * position's optimal packed value (the rule the DuckDB twin replays
  * as `min(len)` over the equality-filtered backpointer join). This is
  * the E-step kernel of Viterbi-EM unigram training
  * ([[graft.ops.Subword.emVocabs]]): exploding the array and summing
  * word frequencies per piece IS the expected-count aggregate under
  * hard assignment.
  *
  * Returns null when any window is unreachable (vocab contract
  * violation — the trainer always keeps every single-codepoint piece,
  * so this cannot happen in the registered pipeline; on a violating
  * corpus the oracle's counts diverge loudly).
  */
case class ViterbiSegmentPieces(child: Expression, vocab: Map[String, Long])
    extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty, "ViterbiSegmentPieces: vocab must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val maxPieceCp: Int =
    vocab.keys.map(p => p.codePointCount(0, p.length)).max

  /** Backwalk one window; appends pieces (in order) to `out`, or
    * returns false when the window end is unreachable.
    */
  private def windowPieces(cps: Array[Int], off: Int, n: Int,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Boolean = {
    val best = Viterbi.windowBest(cps, off, n, vocab, maxPieceCp)
    if (best(n) == Viterbi.NEG) return false
    val rev = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var pos = n
    while (pos > 0) {
      var j = 1
      var found = -1
      val jMax = math.min(maxPieceCp, pos)
      while (found < 0 && j <= jMax) {
        if (best(pos - j) != Viterbi.NEG) {
          val piece = new String(cps, off + pos - j, j)
          vocab.get(piece) match {
            case Some(score) if best(pos - j) + score * 64L - 1L == best(pos) =>
              found = j
              rev += UTF8String.fromString(piece)
            case _ => ()
          }
        }
        j += 1
      }
      // DP invariant: a reachable position always has a predecessor
      pos -= found
    }
    out ++= rev.reverseIterator
    true
  }

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val cps = word.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](math.max(n, 1))
    var off = 0
    while (off < n) {
      val win = math.min(Viterbi.WindowCp, n - off)
      if (!windowPieces(cps, off, win, out)) return null
      off += win
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Viterbi {
  /** Segmentation window in codepoints: the widest DP the per-word
    * packing supports (piece count must stay < 64). Shared with the
    * oracle twin's unroll depth and window pre-split
    * ([[graft.ops.Subword.ViterbiUnroll]]) so both engines run the
    * identical windowed DP.
    */
  val WindowCp = 63

  /** Unreachable-position sentinel in the packed DP table. */
  private[functions] val NEG = Long.MinValue

  /** Forward DP over `cps[off, off+n)`: `best(i)` = the max packed
    * value (Σ score·64 − 1 over consumed pieces) of any segmentation
    * of the first i codepoints, [[NEG]] when unreachable — shared by
    * the stats and backwalk expressions so both consume the identical
    * table.
    */
  private[functions] def windowBest(cps: Array[Int], off: Int, n: Int,
      vocab: Map[String, Long], maxPieceCp: Int): Array[Long] = {
    val best = Array.fill(n + 1)(NEG)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = 1
      val jMax = math.min(maxPieceCp, i)
      while (j <= jMax) {
        if (best(i - j) != NEG) {
          val piece = new String(cps, off + i - j, j)
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
    best
  }

  def viterbiPieces(word: Column, vocab: Map[String, Long]): Column =
    bridge.column(ViterbiPieces(bridge.expression(word), vocab))

  def viterbiSegmentPieces(word: Column, vocab: Map[String, Long]): Column =
    bridge.column(ViterbiSegmentPieces(bridge.expression(word), vocab))
}
