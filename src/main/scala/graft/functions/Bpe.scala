package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Deterministic character-level BPE token counting (Sennrich et al.
  * 2016's public algorithm, arXiv:1508.07909): a word starts as its
  * codepoint sequence; repeatedly the LOWEST-RANK adjacent pair present
  * in the merge table is merged at every non-overlapping occurrence
  * left-to-right, until no table pair remains. The token budget a
  * training pipeline actually packs/samples by is this count, not the
  * whitespace-word count.
  *
  * The merge table is FIXED and shipped with the engine (the "tiny fixed
  * merge table" option): ranks follow the classic public English bigram
  * frequency order (th, he/the, in, er, an, ...), so the table is
  * re-derivable from public letter-frequency tables and embeds no
  * external data. Training merges from a corpus is deliberately NOT done
  * here so the oracle twin (a DuckDB recursive CTE applying the same
  * table) is a closed, engine-independent computation.
  *
  * Scale shape: pure scan work — one native-expression pass per row,
  * zero shuffles. Natural-language words repeat heavily, so the
  * expression memoizes word → count in a thread-confined, size-capped
  * map (the MinHashSigMd5 thread-local pattern); the cache is an
  * executor-local detail invisible to the plan.
  */
object Bpe {

  /** Rank-ordered merges (rank = position + 1, lower merges first). */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "e" -> "n", "a" -> "t", "e" -> "s",
    "o" -> "r", "t" -> "e", "i" -> "s", "i" -> "t", "a" -> "l",
    "a" -> "r", "n" -> "d", "an" -> "d", "in" -> "g", "o" -> "u",
    "o" -> "f", "t" -> "o", "e" -> "d", "s" -> "t", "h" -> "a",
    "s" -> "e", "l" -> "e", "v" -> "e", "m" -> "e", "c" -> "o",
    "d" -> "e", "l" -> "l")

  private val rankOf: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

  /** Word → codepoint symbol sequence (surrogate pairs stay whole), so
    * the result agrees with engines that slice strings by codepoint.
    */
  def codepoints(word: String): List[String] = {
    val b = List.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      b += word.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** One left-to-right non-overlapping merge pass of (l, r) over a token
    * sequence — the shared primitive of APPLICATION (below) and TRAINING
    * ([[graft.ops.BpeTrain]]).
    */
  def mergeOnce(toks: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
    }
    out.result()
  }

  /** Plain-Scala reference: the BPE token sequence of one word under an
    * arbitrary rank-ordered merge table.
    */
  def tokenize(word: String, table: IndexedSeq[(String, String)],
      ranks: Map[(String, String), Int]): List[String] = {
    var toks = codepoints(word)
    var done = false
    while (!done && toks.lengthCompare(1) > 0) {
      // lowest-rank pair present
      var best = Int.MaxValue
      toks.zip(toks.tail).foreach { p =>
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < best) best = r
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = table(best - 1)
        toks = mergeOnce(toks, l, r)
      }
    }
    toks
  }

  /** The fixed-table tokenization. */
  def tokenize(word: String): List[String] =
    tokenize(word, merges.toIndexedSeq, rankOf)

  /** BPE token count of one word. */
  def count(word: String): Int = if (word.isEmpty) 0 else tokenize(word).length

  def count(word: String, table: IndexedSeq[(String, String)],
      ranks: Map[(String, String), Int]): Int =
    if (word.isEmpty) 0 else tokenize(word, table, ranks).length

  /** Σ over an array of words — the per-document budget. */
  def countAll(words: Seq[String]): Long = words.map(count(_).toLong).sum
}

/** `BpeCountSum(words, table)` — sum of per-word BPE token counts over
  * an `array<string>` column, null-in → null-out, under a caller-chosen
  * rank-ordered merge table (the shipped fixed table by default; a
  * corpus-trained one from [[graft.ops.BpeTrain]]). The table rides the
  * expression as a literal — at 100 TB it serializes once per task with
  * the closure, a few KB. Interpreted inner loop (CodegenFallback) with
  * a thread-confined memo: corpora repeat words constantly, so most
  * rows are pure cache hits.
  */
case class BpeCountSum(child: Expression, table: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val indexed = table.toIndexedSeq
  @transient private lazy val ranks: Map[(String, String), Int] =
    table.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer](1 << 12))
  private val MemoCap = 1 << 16

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = memo.get()
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        var c = m.get(w)
        if (c == null) {
          c = Int.box(Bpe.count(w, indexed, ranks))
          if (m.size() < MemoCap) m.put(w, c)
        }
        sum += c.intValue()
      }
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCountSum {
  def bpeCountSum(words: Column): Column =
    bpeCountSum(words, Bpe.merges)

  def bpeCountSum(words: Column, table: Seq[(String, String)]): Column =
    bridge.column(BpeCountSum(bridge.expression(words), table))
}

/** `BpeEncodeIds(words, table, vocab)` — the flattened token-ID
  * sequence of a document (`array<string>` words → `array<int>` ids):
  * what a training loader actually reads. Same tokenizer recursion and
  * thread-confined word memo as [[BpeCountSum]] (so `size(ids)` always
  * equals the count the packing metadata was planned with); the vocab
  * (base alphabet + merge outputs, a few KB) rides the expression as a
  * literal. An out-of-vocabulary token fails loudly — the vocab is
  * BUILT from the corpus alphabet, so a miss means the caller encoded
  * a different corpus than it built the vocab for, and a silent UNK
  * would corrupt training data downstream.
  */
case class BpeEncodeIds(child: Expression, table: Seq[(String, String)],
    vocab: Map[String, Int])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val indexed = table.toIndexedSeq
  @transient private lazy val ranks: Map[(String, String), Int] =
    table.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[Int]](1 << 12))
  private val MemoCap = 1 << 16

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = memo.get()
    val out = new scala.collection.mutable.ArrayBuffer[Int](arr.numElements() * 2)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        var ids = m.get(w)
        if (ids == null) {
          ids = Bpe.tokenize(w, indexed, ranks).map { t =>
            vocab.getOrElse(t, throw new IllegalArgumentException(
              s"token '$t' of word '$w' not in the ${vocab.size}-entry vocab — " +
                "encode called with a vocab built from a different corpus"))
          }.toArray
          if (m.size() < MemoCap) m.put(w, ids)
        }
        out ++= ids
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeIds {
  def bpeEncodeIds(words: Column, table: Seq[(String, String)],
      vocab: Map[String, Int]): Column =
    bridge.column(BpeEncodeIds(bridge.expression(words), table, vocab))

  /** The id contract: base alphabet symbols (sorted) take 0..B-1, the
    * rank-i merge's output token takes B+i-1. A merge output string
    * that collides with an earlier id (same surface string) keeps the
    * FIRST id, so every token string has exactly one id.
    */
  def buildVocab(alphabet: Seq[String], table: Seq[(String, String)]): Map[String, Int] = {
    val base = alphabet.distinct.sorted.zipWithIndex.toMap
    val b = base.size
    table.zipWithIndex.foldLeft(base) { case (v, ((l, r), i)) =>
      val tok = l + r
      if (v.contains(tok)) v else v + (tok -> (b + i))
    }
  }
}
