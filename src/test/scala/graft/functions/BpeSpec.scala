package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenize: canonical merge walks") {
    // t+h -> th, th+e -> the
    assert(Bpe.tokenize("the") === List("the"))
    // th + in (i+n fires rank 3)
    assert(Bpe.tokenize("thin") === List("th", "in"))
    // no merge spans word-piece boundaries that were never merged
    assert(Bpe.tokenize("tintin") === List("t", "in", "t", "in"))
    // unknown chars stay single
    assert(Bpe.tokenize("xyz") === List("x", "y", "z"))
    assert(Bpe.count("") === 0)
  }

  test("tokenize: left-to-right non-overlapping merging") {
    // rank-25 (h,a): "hahaha" -> ha ha ha (no overlap ambiguity)
    assert(Bpe.tokenize("hahaha") === List("ha", "ha", "ha"))
    // lowest rank wins first: in "ther" both (t,h) r1 and (e,r) r4
    // are present; after th, (th,e) r2 beats (e,r) r4 -> [the, r]
    assert(Bpe.tokenize("ther") === List("the", "r"))
  }

  test("tokenize is codepoint-level: surrogate pairs stay whole") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.tokenize(s"a${emoji}b") === List("a", emoji, "b"))
  }

  test("BpeCountSum expression equals the plain-Scala reference on the corpus") {
    val docs = graft.catalog.Catalog(spark, sf).ref("documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
    val viaExpr = docs
      .select(col("doc_id"), BpeCountSum.bpeCountSum(col("toks")).as("n"))
      .as[(Long, Long)].collect().toMap
    val viaRef = docs.as[(Long, Seq[String])].collect()
      .map { case (id, toks) => (id, Bpe.countAll(toks)) }.toMap
    assert(viaExpr === viaRef)
    assert(viaExpr.values.sum > 0)
    // BPE compresses: strictly fewer pieces than characters, at least
    // as many as whitespace words
    val words = docs.select(col("doc_id"), size(col("toks")).cast("long").as("w"))
      .as[(Long, Long)].collect().toMap
    viaExpr.foreach { case (id, n) => assert(n >= words(id)) }
  }

  test("BpeCountSum: null array -> null, null elements skipped") {
    val df = Seq((1L, Some(Seq("the", "thin"))), (2L, None))
      .toDF("id", "toks")
      .select(col("id"), BpeCountSum.bpeCountSum(col("toks")).as("n"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getLong(1) === 3L) // the=1, thin=2
    assert(rows(1).isNullAt(1))
  }
}
