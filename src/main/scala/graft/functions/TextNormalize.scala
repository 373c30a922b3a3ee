package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native scan-local expression.
  *
  * Every public corpus pipeline (C4, CCNet, Dolma, RefinedWeb) canonical-
  * izes text before hashing: without it, `"Café"` composed (U+00E9) and
  * decomposed (`e` + U+0301) are different byte strings, so exact dedup,
  * MinHash shingles, fingerprints and contamination n-grams all silently
  * miss equal-looking documents. NFC (canonical composition) is the
  * right form for that: visually/semantically identical sequences map to
  * one byte representation while compatibility characters (ligatures,
  * full-width forms) are left alone.
  *
  * Implementation notes:
  *   - ASCII fast path: web-scale corpora are overwhelmingly ASCII; a
  *     byte scan (all bytes < 0x80 ⇒ already NFC) skips the
  *     UTF8String→String→normalize→UTF8String round-trip entirely, so
  *     the common row costs one tight loop over the bytes.
  *   - Non-ASCII rows use `Normalizer.isNormalized` (cheap verification
  *     pass) before paying for `Normalizer.normalize`'s rebuild.
  *   - `CodegenFallback` per the repo's expression convention
  *     (functions/ArrayExprs.scala:20-24): the per-row work is plain JVM
  *     code; codegen would only save the one virtual call.
  *
  * Deterministic, null-in → null-out, side-effect free — Catalyst can
  * push, prune and reorder around it. DuckDB twin: `nfc_normalize()`
  * (both implement Unicode canonical composition; the fixture chars are
  * stable across Unicode versions).
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((u.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def apply(c: Column): Column = bridge.column(NfcNormalizeExpr(bridge.expression(c)))
}
