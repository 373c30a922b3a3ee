package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** `MultiMatch(text, patterns)` — Aho–Corasick multi-pattern scan as ONE
  * scan-local expression (Aho & Corasick, CACM 1975 — public): find,
  * in a single pass over the document, which of P blocklist phrases
  * occur, where the earliest occurrence starts, and which pattern it is.
  *
  * Returns `struct<n_hit: bigint, first_pos: int, first_pat: string>`:
  *  - n_hit     = number of DISTINCT patterns present;
  *  - first_pos = 1-based CODEPOINT position of the earliest match start
  *                (ties → the lowest pattern index), 0 when none —
  *                codepoints, not UTF-16 units, because that is what the
  *                DuckDB twin's `strpos` counts;
  *  - first_pat = that pattern's text, '' when none.
  *
  * Why an automaton and not P `contains` calls: per-pattern scanning is
  * O(P·|text|) — a 10⁵-phrase blocklist over 100 TB of text re-reads
  * the corpus 10⁵ times. The goto/fail automaton is O(|text| + matches)
  * per row regardless of P, and ships with the plan as expression state
  * (the language-ID profile / k-means "model as literal" pattern). The
  * scan early-exits once every pattern has been seen.
  *
  * Per-pattern FIRST match is enough to compute every output: for a
  * fixed pattern all occurrences have equal length, so earliest end ⇒
  * earliest start, and the global earliest start is the min over
  * patterns of their firsts.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "MultiMatch: patterns must be non-empty strings")

  override def dataType: DataType = StructType(Seq(
    StructField("n_hit", LongType, nullable = false),
    StructField("first_pos", IntegerType, nullable = false),
    StructField("first_pat", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true

  // automaton (built once per task from the pattern literal)
  @transient private lazy val ac = AhoCorasick.build(patterns)
  @transient private lazy val patLens: Array[Int] =
    patterns.map(p => p.codePointCount(0, p.length)).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val nPat = patterns.size
    val firstStart = new Array[Int](nPat) // 0 = unseen; else 1-based start
    var nFound = 0
    var state = 0
    var cpPos = 0
    var i = 0
    while (i < text.length && nFound < nPat) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      cpPos += 1
      state = ac.step(state, cp)
      var o = if (ac.out(state).nonEmpty) state else ac.outLink(state)
      while (o != 0) {
        ac.out(o).foreach { pid =>
          if (firstStart(pid) == 0) {
            firstStart(pid) = cpPos - patLens(pid) + 1
            nFound += 1
          }
        }
        o = ac.outLink(o)
      }
    }
    var bestPos = 0
    var bestPid = -1
    var pid = 0
    while (pid < nPat) {
      val s = firstStart(pid)
      if (s > 0 && (bestPid == -1 || s < bestPos)) { bestPos = s; bestPid = pid }
      pid += 1
    }
    InternalRow(nFound.toLong, bestPos,
      UTF8String.fromString(if (bestPid >= 0) patterns(bestPid) else ""))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatch {
  def multiMatch(text: Column, patterns: Seq[String]): Column =
    bridge.column(MultiMatch(bridge.expression(text), patterns))
}

/** Shared Aho–Corasick automaton for [[MultiMatch]] and
  * [[MultiReplace]]: goto maps over codepoints, BFS fail links,
  * per-node output pattern ids, and outLink = nearest fail-ancestor
  * with output (the textbook construction, built once per task).
  */
private[functions] final class AcAutomaton(
    gotos: Array[Map[Int, Int]],
    fail: Array[Int],
    val out: Array[List[Int]],
    val outLink: Array[Int]) extends Serializable {
  /** One transition: follow fail links until a goto matches (or root). */
  def step(state: Int, cp: Int): Int = {
    var s = state
    while (s != 0 && !gotos(s).contains(cp)) s = fail(s)
    gotos(s).getOrElse(cp, 0)
  }
}

private[functions] object AhoCorasick {
  def build(patterns: Seq[String]): AcAutomaton = {
    val gotos = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val outs = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        i += Character.charCount(cp)
        s = gotos(s).getOrElseUpdate(cp, {
          gotos += mutable.HashMap.empty[Int, Int]
          outs += Nil
          gotos.size - 1
        })
      }
      outs(s) = outs(s) :+ pid
    }
    val n = gotos.size
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotos(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotos(u).foreach { case (cp, v) =>
        var f = fail(u)
        while (f != 0 && !gotos(f).contains(cp)) f = fail(f)
        fail(v) = if (f != u && gotos(f).contains(cp)) gotos(f)(cp) else 0
        queue += v
      }
      outLink(u) = if (outs(fail(u)).nonEmpty) fail(u) else outLink(fail(u))
    }
    new AcAutomaton(gotos.map(_.toMap).toArray, fail, outs.toArray, outLink)
  }
}
