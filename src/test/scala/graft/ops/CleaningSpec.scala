package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkTestBase {

  test("c4Rules: every kept line ends in terminal punctuation, has >=5 words, no javascript") {
    val rows = Cleaning.c4Rules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[String]("text_clean").split("\n")
      assert(kept.length == r.getAs[Long]("n_kept"))
      assert(kept.length >= 3) // doc-level minimum
      kept.foreach { l =>
        assert(l.matches(".*[.!?\"]$"), s"no terminal punct: $l")
        assert(l.split(" ").length >= 5, s"short line kept: $l")
        assert(!l.contains("javascript"), s"javascript line kept: $l")
      }
      assert(!r.getAs[String]("text_clean").contains("lorem ipsum"))
      assert(!r.getAs[String]("text_clean").contains("{"))
    }
  }

  test("c4Rules: the doc-level rules actually fire on this corpus") {
    // Rebuild the fixture's line arrays and verify the operator dropped
    // exactly the docs the rules condemn (lorem/brace pages, <3 lines).
    val all = Catalog(spark, sf).ref("documents").select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Cleaning.c4Rules(spark, sf).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all))
    assert(kept.size < all.size, "no doc was dropped — fixture is vacuous")
    assert(kept.nonEmpty)
  }

  test("piiScrub: counts match plantings and the scrubbed text is PII-free") {
    val rows = Cleaning.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b".r
    val num = "\\b\\d{8,}\\b".r
    var planted = 0
    rows.foreach { r =>
      val s = r.getAs[String]("scrubbed")
      assert(email.findFirstIn(s).isEmpty, s"email survived: $s")
      assert(ip.findFirstIn(s).isEmpty, s"ip survived: $s")
      assert(num.findFirstIn(s).isEmpty, s"number survived: $s")
      val n = r.getAs[Long]("n_emails") + r.getAs[Long]("n_ips") + r.getAs[Long]("n_nums")
      if (n > 0) planted += 1
      assert((s.contains("<EMAIL>")) == (r.getAs[Long]("n_emails") > 0))
      assert((s.contains("<IP>")) == (r.getAs[Long]("n_ips") > 0))
      assert((s.contains("<NUM>")) == (r.getAs[Long]("n_nums") > 0))
    }
    assert(planted > 0, "no PII planted — fixture is vacuous")
    assert(planted < rows.length, "every doc got PII — draw is degenerate")
  }

  test("piiScrub: replacement is count-consistent (each match became one placeholder)") {
    val rows = Cleaning.piiScrub(spark, sf).collect()
    rows.foreach { r =>
      val s = r.getAs[String]("scrubbed")
      def occ(tok: String): Long = s.sliding(tok.length).count(_ == tok).toLong
      assert(occ("<EMAIL>") == r.getAs[Long]("n_emails"))
      assert(occ("<IP>") == r.getAs[Long]("n_ips"))
      assert(occ("<NUM>") == r.getAs[Long]("n_nums"))
    }
  }

  test("normalizeText: composes NFC, strips invisibles, collapses runs, and is idempotent") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "Cafe\u0301  bon"),            // decomposed accent + double space
      (2L, "na\u200Bive\uFEFF plain"),    // ZWSP + BOM
      (3L, "x\u0007y\tz\u00AD"),          // control + tab + soft hyphen
      (4L, " edge  case "),               // trim + collapse only
      (5L, "already clean"),              // identity
      (6L, null.asInstanceOf[String]))    // null-in -> null-out
      .toDF("doc_id", "raw")
    val out = graft.functions.NfcNormalizeExpr(col("raw"))
    val norm = dirty.withColumn("text_norm",
      trim(regexp_replace(
        regexp_replace(out,
          "[\\x{0000}-\\x{0008}\\x{000B}-\\x{001F}\\x{007F}\\x{00AD}\\x{200B}-\\x{200F}\\x{2060}\\x{FEFF}]", ""),
        "[ \\t]+", " ")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(norm(1L) == "Caf\u00e9 bon")       // U+0301 composed into U+00E9
    assert(norm(2L) == "naive plain")
    assert(norm(3L) == "xy z")                // BEL/SHY stripped, tab collapsed
    assert(norm(4L) == "edge case")
    assert(norm(5L) == "already clean")
    assert(norm(6L) == null)
  }

  test("normalizeText: operator output is NFC-idempotent and flags exactly the altered docs") {
    val rows = Cleaning.normalizeText(spark, sf).collect()
    assert(rows.nonEmpty)
    var changed = 0
    rows.foreach { r =>
      val t = r.getAs[String]("text_norm")
      assert(java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC))
      assert(!t.exists(c => (c < ' ' && c != '\n') || c == '\u200B' || c == '\uFEFF' || c == '\u00AD'))
      assert(!t.contains("  "), s"uncollapsed run in doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_norm") == t.codePointCount(0, t.length))
      if (r.getAs[Boolean]("changed")) changed += 1
    }
    assert(changed > 0, "no doc changed — fixture is vacuous")
    assert(changed < rows.length, "every doc changed — identity path untested")
  }

  private def Catalog(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.catalog.Catalog(spark, dir)
}
