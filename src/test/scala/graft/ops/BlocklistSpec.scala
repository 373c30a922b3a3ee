package graft.ops

import graft.SparkTestBase
import graft.functions.MultiMatch
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive per-pattern reference: distinct presence, earliest codepoint
    * start (ties → lowest pattern index).
    */
  private def naive(text: String, pats: Seq[String]): (Long, Int, String) = {
    val firsts = pats.zipWithIndex.flatMap { case (p, i) =>
      val idx = text.indexOf(p)
      if (idx < 0) None
      else Some((text.codePointCount(0, idx) + 1, i, p))
    }
    if (firsts.isEmpty) (0L, 0, "")
    else {
      val (pos, _, pat) = firsts.minBy { case (pos, i, _) => (pos, i) }
      (firsts.size.toLong, pos, pat)
    }
  }

  private def run(texts: Seq[String], pats: Seq[String]): Seq[(Long, Int, String)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), MultiMatch.multiMatch(col("text"), pats).as("mm"))
      .orderBy("id")
      .collect()
      .map { r =>
        val s = r.getStruct(1)
        (s.getLong(0), s.getInt(1), s.getString(2))
      }.toSeq

  test("matches a naive per-pattern reference on random word-salad") {
    val rnd = new scala.util.Random(31)
    val vocab = Seq("agg", "table", "fast", "join", "slow", "scan", "a", "the")
    val texts = (0 until 200).map(_ =>
      (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val pats = Seq("agg table", "table table", "fast join", "agg", "the a", "zz")
    val got = run(texts, pats)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === naive(t, pats), s"diverged on: $t")
    }
  }

  test("prefix patterns and overlapping occurrences all register (output links)") {
    // "aba" contains "a" (pos 1), "ab" (pos 1), "ba" (pos 2), "aba" (pos 1)
    val got = run(Seq("aba"), Seq("a", "ab", "ba", "aba", "bb"))
    assert(got.head === ((4L, 1, "a")))
    // suffix-only match via fail links: "xab" hits "ab" but not "xa"-less pats
    val got2 = run(Seq("xab"), Seq("ab", "xa", "cab"))
    assert(got2.head._1 === 2L) // "ab" and "xa"
  }

  test("positions are codepoints, not UTF-16 units (astral-plane prefix)") {
    // U+1F600 is 2 UTF-16 chars but 1 codepoint; "cat" starts at codepoint 3
    val got = run(Seq("😀 cat"), Seq("cat"))
    assert(got.head === ((1L, 3, "cat")))
  }

  test("clean documents report the zero sentinel triple") {
    val got = run(Seq("nothing to see here"), Seq("zebra", "xylophone"))
    assert(got.head === ((0L, 0, "")))
  }

  test("registered query screens the documents table; absent phrase never fires") {
    val out = Blocklist.screen(spark, sf)
    val rows = out.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getString(3) != "zzzz never"))
    // the demo phrases do occur in the synthetic corpus
    assert(rows.count(_.getLong(1) > 0) > 100, "expected widespread hits")
    // whenever anything hits, the first pattern/pos are consistent
    rows.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getInt(2) >= 1)
      assert(Blocklist.DemoPatterns.contains(r.getString(3)))
    }
  }

  test("screen plan is pure scan work: no exchange except the presentation sort") {
    val plan = Blocklist.screen(spark, sf).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 0, s"blocklist screen must not shuffle:\n$plan")
  }
  test("scrub: Aho-Corasick replacement equals Spark regexp_replace with the alternation") {
    import graft.functions.MultiReplace
    val rnd = new scala.util.Random(47)
    val vocab = Seq("agg", "table", "fast", "a", "ab", "aba", "x")
    val texts = (0 until 300).map(_ =>
      (0 until 25).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val pats = Seq("agg table", "table", "ab", "aba", "a x", "zz")
    val re = MultiReplace.alternationRegex(pats)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"),
        MultiReplace.multiReplace(col("text"), pats, "[MASKED]").as("mr"),
        regexp_replace(col("text"), lit(re), lit("[MASKED]")).as("viaRegex"))
      .orderBy("id")
    df.collect().foreach { r =>
      val ac = r.getStruct(1).getString(0)
      assert(ac === r.getString(2), s"AC vs regex diverge on row ${r.getLong(0)}")
    }
  }

  test("scrub: leftmost-longest wins; count matches masked spans; clean docs filtered") {
    import graft.functions.MultiReplace
    val out = Seq((0L, "aba ab x"), (1L, "clean"), (2L, "ababa"))
      .toDF("id", "text")
      .select(col("id"), MultiReplace.multiReplace(col("text"),
        Seq("ab", "aba"), "_").as("mr"))
      .orderBy("id").collect()
      .map(r => (r.getStruct(1).getString(0), r.getStruct(1).getInt(1)))
    // "aba ab x": "aba" (longest at 0) then "ab" -> "_ _ x", 2 masks
    assert(out(0) === (("_ _ x", 2)))
    assert(out(1) === (("clean", 0)))
    // "ababa": "aba" (longest at 0) consumes [0,3); the remaining "ba"
    // matches nothing -> "_ba" with one mask — no overlap re-entry
    assert(out(2) === (("_ba", 1)))
  }

  test("registered scrub query only returns changed docs and masks every demo phrase") {
    val out = Blocklist.scrub(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(2) > 0)
      val t = r.getString(1)
      Blocklist.DemoPatterns.filterNot(_ == "agg").foreach { p =>
        assert(!t.contains(p), s"unmasked phrase '$p' in doc ${r.getLong(0)}")
      }
      assert(t.contains(Blocklist.Mask))
    }
  }
  test("scrub splices correctly around astral-plane characters") {
    import graft.functions.MultiReplace
    import spark.implicits._
    val out = Seq((0L, "\ud83d\ude00cat and cat"), (1L, "a\ud83d\ude00b"))
      .toDF("id", "text")
      .select(col("id"), MultiReplace.multiReplace(col("text"),
        Seq("cat", "a\ud83d\ude00b"), "[X]").as("mr"))
      .orderBy("id").collect()
      .map(r => (r.getStruct(1).getString(0), r.getStruct(1).getInt(1)))
    assert(out(0) === (("\ud83d\ude00[X] and [X]", 2)))
    assert(out(1) === (("[X]", 1))) // pattern containing the astral char itself
  }
  test("empty text: screen reports the zero triple, scrub returns it unchanged") {
    import graft.functions.{MultiMatch, MultiReplace}
    val row = Seq((0L, "")).toDF("id", "text")
      .select(MultiMatch.multiMatch(col("text"), Seq("x")).as("mm"),
        MultiReplace.multiReplace(col("text"), Seq("x"), "_").as("mr"))
      .head
    assert(row.getStruct(0).getLong(0) === 0L)
    assert(row.getStruct(0).getString(2) === "")
    assert(row.getStruct(1).getString(0) === "")
    assert(row.getStruct(1).getInt(1) === 0)
  }
}
