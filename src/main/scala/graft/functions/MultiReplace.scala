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

  // pattern lengths in UTF-16 units: match starts are recovered from
  // automaton end positions in the same unit the StringBuilder splices
  @transient private lazy val patLen16: Array[Int] = patterns.map(_.length).toArray
  @transient private lazy val ac = AhoCorasick.build(patterns)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Pass 1: collect every match as (startChar, endChar) UTF-16 spans.
    // AC reports END positions; pattern length in chars recovers starts.
    var state = 0
    var i = 0
    // matches keyed by start: keep only the LONGEST (then lowest pid)
    val bestEnd = new java.util.HashMap[Integer, Integer]()
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      state = ac.step(state, cp)
      val end = i + w
      var o = if (ac.out(state).nonEmpty) state else ac.outLink(state)
      while (o != 0) {
        ac.out(o).foreach { pid =>
          val start = end - patLen16(pid)
          val prev = bestEnd.get(start)
          if (prev == null || end > prev) bestEnd.put(start, end)
        }
        o = ac.outLink(o)
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
