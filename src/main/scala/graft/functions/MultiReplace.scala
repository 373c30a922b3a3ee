package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `MultiReplace(text, patterns, mask)` — mask every blocklist phrase in
  * one Aho–Corasick pass, with LEFTMOST-LONGEST non-overlapping match
  * selection: scan left to right, at each position the longest matching
  * phrase wins (ties → lowest pattern index, same mask either way), the
  * scan resumes after the consumed span.
  *
  * These are exactly the semantics of `regexp_replace(text,
  * 'p1|p2|…', mask, 'g')` with the literal-escaped alternation sorted
  * by length descending — RE2 and java.util.regex both try
  * alternatives in order at the leftmost position, so longest-first
  * ordering makes leftmost-first ≡ leftmost-longest. That equivalence
  * is the oracle contract (the DuckDB twin IS that regexp_replace) and
  * MultiReplaceSpec pins it against Spark's own regexp_replace on
  * random data.
  *
  * Why not just the built-in regexp_replace? For a handful of phrases,
  * do use it. This expression exists for the 10⁴–10⁵-phrase blocklist
  * where a single alternation regex degrades (compile size, per-
  * position alternative scans): the automaton is built once per task
  * and matching stays O(|text| + matches) no matter how many phrases.
  *
  * Returns `struct<text_scrubbed: string, n_masked: int>`.
  */
case class MultiReplace(child: Expression, patterns: Seq[String], mask: String)
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "MultiReplace: patterns must be non-empty strings")

  override def dataType: DataType = StructType(Seq(
    StructField("text_scrubbed", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  @transient private lazy val patChars: Array[String] = patterns.toArray

  // Local automaton copy: goto maps, fail links, outputs per node.
  @transient private lazy val (gotoMaps, failArr, outArr, outLinkArr) = {
    // same construction as MultiMatch's automaton (kept private there;
    // the ~30 shared lines are the classic textbook build)
    val gotos = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Int, Int])
    val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        i += Character.charCount(cp)
        s = gotos(s).getOrElseUpdate(cp, {
          gotos += scala.collection.mutable.HashMap.empty[Int, Int]
          outs += Nil
          gotos.size - 1
        })
      }
      outs(s) = outs(s) :+ pid
    }
    val n = gotos.size
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
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
    (gotos.map(_.toMap).toArray, fail, outs.toArray, outLink)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Pass 1: collect every match as (startChar, endChar) UTF-16 spans.
    // AC reports END positions; pattern length in chars recovers starts.
    val patLen16 = patChars.map(_.length)
    var state = 0
    var i = 0
    // matches keyed by start: keep only the LONGEST (then lowest pid)
    val bestEnd = new java.util.HashMap[Integer, Integer]()
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      while (state != 0 && !gotoMaps(state).contains(cp)) state = failArr(state)
      state = gotoMaps(state).getOrElse(cp, 0)
      val end = i + w
      var o = if (outArr(state).nonEmpty) state else outLinkArr(state)
      while (o != 0) {
        outArr(o).foreach { pid =>
          val start = end - patLen16(pid)
          val prev = bestEnd.get(start)
          if (prev == null || end > prev) bestEnd.put(start, end)
        }
        o = outLinkArr(o)
      }
      i += w
    }
    // Pass 2: greedy leftmost-longest selection over starts.
    val sb = new java.lang.StringBuilder(text.length)
    var pos = 0
    var n = 0
    while (pos < text.length) {
      val e = bestEnd.get(pos)
      if (e != null) {
        sb.append(mask)
        n += 1
        pos = e
      } else {
        sb.append(text.charAt(pos))
        pos += 1
      }
    }
    InternalRow(UTF8String.fromString(sb.toString), n)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiReplace {
  def multiReplace(text: Column, patterns: Seq[String], mask: String): Column =
    bridge.column(MultiReplace(bridge.expression(text), patterns, mask))

  /** The equivalent alternation regex (literal-escaped, length-desc then
    * pattern-order): `regexp_replace(text, this, mask, 'g')` reproduces
    * MultiReplace exactly — the oracle/spec contract.
    */
  def alternationRegex(patterns: Seq[String]): String =
    patterns.zipWithIndex
      .sortBy { case (p, i) => (-p.length, i) }
      .map { case (p, _) => p.flatMap(c =>
        if (c.isLetterOrDigit || c == ' ') c.toString else "\\" + c) }
      .mkString("|")
}
