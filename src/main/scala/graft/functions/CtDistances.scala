package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._


/** `CtDistances(tokens)` — the whole Cavnar–Trenkle document side as ONE
  * scan-local expression: per row, extract the 1..3-grams of every
  * `_`-padded token ([[LangProfiles.wordGrams]] semantics, codepoint
  * slicing), count them, rank the top-K by (count desc, gram asc in
  * UTF-8 BYTE order — the engines' binary VARCHAR collation), and fold
  * the out-of-place distance against every trained profile. Returns
  * `struct<ng: int, dists: array<long>>` with distances in
  * [[LangProfiles.langs]] order; null when the document has no grams.
  *
  * This replaces a 20M-row gram explode + (doc, gram) shuffle + per-doc
  * rank window with pure per-row work — the classifier becomes
  * shuffle-free scan work at any corpus size (measured 4.3 s → sub-
  * second at sf0.1). The relational DuckDB twin is unchanged: counting
  * and ranking inside one row is arithmetic the oracle still
  * hash-checks.
  */
case class CtDistances(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ng", IntegerType),
    StructField("dists", ArrayType(LongType, containsNull = false))))
  override def nullIntolerant: Boolean = true

  @transient private lazy val profs: Array[java.util.HashMap[String, Integer]] =
    LangProfiles.langs.map { l =>
      val m = new java.util.HashMap[String, Integer]()
      LangProfiles.profiles(l).foreach { case (g, r) => m.put(g, r) }
      m
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val K = LangProfiles.K
    val counts = new java.util.HashMap[String, Integer](1 << 10)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          val p = "_" + w + "_"
          // codepoint boundaries of the padded word
          val cps = {
            val b = Array.newBuilder[Int]
            var j = 0
            while (j < p.length) { b += j; j += Character.charCount(p.codePointAt(j)) }
            b += p.length
            b.result()
          }
          val m = cps.length - 1 // number of codepoints
          var ng = 1
          while (ng <= 3) {
            var s = 0
            while (s + ng <= m) {
              val g = p.substring(cps(s), cps(s + ng))
              val c = counts.get(g)
              counts.put(g, if (c == null) 1 else c + 1)
              s += 1
            }
            ng += 1
          }
        }
      }
      i += 1
    }
    if (counts.isEmpty) return null
    // top-K by (count desc, gram asc in UTF-8 byte order); sort keys
    // precomputed once per distinct gram, not per comparison
    val entries = new Array[(String, Int, Array[Byte])](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      entries(k) = (e.getKey, e.getValue,
        e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      k += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Int, Array[Byte])] {
      override def compare(a: (String, Int, Array[Byte]),
          b: (String, Int, Array[Byte])): Int = {
        if (a._2 != b._2) Integer.compare(b._2, a._2)
        else java.util.Arrays.compareUnsigned(a._3, b._3)
      }
    })
    val top = math.min(K, entries.length)
    val dists = new Array[Long](profs.length)
    var li = 0
    while (li < profs.length) {
      val prof = profs(li)
      var d = 0L
      var r = 0
      while (r < top) {
        val rl = prof.get(entries(r)._1)
        d += (if (rl == null) K.toLong else math.abs((r + 1) - rl.intValue()).toLong)
        r += 1
      }
      dists(li) = d
      li += 1
    }
    InternalRow(top, new GenericArrayData(dists))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CtDistances {
  def ctDistances(tokens: Column): Column =
    bridge.column(CtDistances(bridge.expression(tokens)))
}
