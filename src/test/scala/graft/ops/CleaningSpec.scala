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

  private def Catalog(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.catalog.Catalog(spark, dir)
}
