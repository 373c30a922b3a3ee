package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `GreedyPieceCount(word, vocab)` — WordPiece-style greedy
  * longest-match subword segmentation (the tokenization side of Wu et
  * al. 2016, "Google's Neural Machine Translation System" — public),
  * returning how many vocabulary pieces the word splits into.
  *
  * Semantics (exactly the DuckDB twin's recursive CTE): scan left to
  * right; at each position consume the LONGEST vocab piece matching the
  * upcoming codepoints; count consumed pieces. The caller guarantees
  * no-OOV by including every corpus codepoint as a single-char piece —
  * a position with no match returns the -1 sentinel (the SQL twin drops
  * such words from the fixpoint, so the sentinel would surface as a
  * row-count mismatch rather than silent drift).
  *
  * The vocab rides with the plan as a codepoint trie built once per
  * task — scan-local, zero shuffles, the language-ID "model as literal"
  * pattern. Matching is O(|word| · maxPieceLen) worst case.
  */
case class GreedyPieceCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
    "GreedyPieceCount: vocab pieces must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  // codepoint trie: node 0 = root; terminal marks piece ends
  @transient private lazy val (trieNext, trieTerm) = {
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Int, Int])
    val term = scala.collection.mutable.ArrayBuffer(false)
    vocab.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        i += Character.charCount(cp)
        s = next(s).getOrElseUpdate(cp, {
          next += scala.collection.mutable.HashMap.empty[Int, Int]
          term += false
          next.size - 1
        })
      }
      term(s) = true
    }
    (next.map(_.toMap).toArray, term.toArray)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    var pos = 0
    var n = 0
    while (pos < word.length) {
      // walk the trie as far as it matches; remember the last terminal
      var s = 0
      var i = pos
      var lastEnd = -1
      var continue = true
      while (continue && i < word.length) {
        val cp = word.codePointAt(i)
        trieNext(s).get(cp) match {
          case Some(nx) =>
            i += Character.charCount(cp)
            s = nx
            if (trieTerm(s)) lastEnd = i
          case None => continue = false
        }
      }
      if (lastEnd < 0) return -1 // OOV position — caller's vocab contract broken
      pos = lastEnd
      n += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Wordpiece {
  def greedyPieceCount(word: Column, vocab: Seq[String]): Column =
    bridge.column(GreedyPieceCount(bridge.expression(word), vocab))
}
