package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkTestBase {

  private def docsW(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
  }

  test("offset-by-half-a-chunk duplicate: invisible to aligned chunks, caught by sliding windows") {
    // doc 1: tokens a0..a19. doc 2: fresh prefix of 5 tokens, then doc 1's
    // tokens a3..a15 verbatim — a 13-token exact substring match that sits
    // at offset 5, straddling doc 2's 10-word chunk grid.
    val a = (0 until 20).map(i => s"a$i")
    val copied = a.slice(3, 16) // 13 tokens
    val d1 = a.mkString(" ")
    val d2 = ((0 until 5).map(i => s"b$i") ++ copied).mkString(" ")
    val fixture = docsW(1L -> d1, 2L -> d2)

    // paragraphDedup's aligned chunks see chunk "b0..a7" and "a8..a15 (+pad)"
    // — neither equals any chunk of doc 1, so NOTHING is dropped.
    val para = Dedup.paragraphDedupOnW(fixture, 10)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(para === 0L, "aligned chunking must miss the shifted duplicate")

    // sliding 10-token windows catch it: doc 2 positions 5..8 all have
    // earlier twins in doc 1 (positions 3..6) -> one maximal span [5, 17].
    val spans = Dedup.substringSpansOnW(fixture, 10)
      .orderBy("doc_id", "span_start").collect()
    assert(spans.length === 1, spans.mkString(";"))
    val s = spans.head
    assert(s.getLong(0) === 2L)
    assert(s.getAs[Long]("span_start") === 5L)
    assert(s.getAs[Long]("span_end") === 17L)
    assert(s.getAs[Long]("span_len") === 13L)
  }

  test("within-doc repetition and adjacent windows merge into maximal spans") {
    // one doc where tokens 0..9 repeat verbatim at 10..19 (aligned) and a
    // distinct tail; the second occurrence is one maximal span
    val ten = (0 until 10).map(i => s"t$i")
    val doc = (ten ++ ten ++ Seq("x", "y", "z")).mkString(" ")
    val spans = Dedup.substringSpansOnW(docsW(7L -> doc), 10).collect()
    assert(spans.length === 1)
    assert(spans.head.getAs[Long]("span_start") === 10L)
    assert(spans.head.getAs[Long]("span_end") === 19L)
  }

  test("disjoint duplicated regions stay separate spans") {
    val p = (0 until 10).map(i => s"p$i")
    val q = (0 until 10).map(i => s"q$i")
    val d1 = (p ++ Seq("u1", "u2", "u3") ++ q).mkString(" ")
    val d2 = (p ++ Seq("v1", "v2", "v3", "v4") ++ q).mkString(" ")
    val spans = Dedup.substringSpansOnW(docsW(1L -> d1, 2L -> d2), 10)
      .orderBy("doc_id", "span_start").collect()
    // doc 2 owns both duplicate spans (doc 1 is first occurrence everywhere)
    assert(spans.forall(_.getLong(0) === 2L))
    assert(spans.length === 2, spans.mkString(";"))
    assert(spans(0).getAs[Long]("span_start") === 0L)
    assert(spans(0).getAs[Long]("span_end") === 9L)
    assert(spans(1).getAs[Long]("span_start") === 14L)
    assert(spans(1).getAs[Long]("span_end") === 23L)
  }

  test("docs shorter than k contribute nothing and do not crash") {
    val spans = Dedup.substringSpansOnW(
      docsW(1L -> "only three words", 2L -> "only three words"), 10).collect()
    assert(spans.isEmpty)
  }
}
