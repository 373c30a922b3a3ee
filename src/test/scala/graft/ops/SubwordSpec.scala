package graft.ops

import graft.SparkTestBase
import graft.functions.Wordpiece
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive greedy longest-match reference. */
  private def naive(word: String, vocab: Set[String]): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      val maxL = math.min(word.length - pos, vocab.map(_.length).max)
      val pick = (maxL to 1 by -1)
        .map(l => word.substring(pos, pos + l)).find(vocab.contains)
      pick match {
        case Some(p) => pos += p.length; n += 1
        case None    => return -1
      }
    }
    n
  }

  test("greedy piece count matches the naive reference on random words") {
    val rnd = new scala.util.Random(53)
    val vocab = Seq("a", "b", "c", "ab", "bc", "abc", "cab", "bb")
    val words = (0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val got = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "word")
      .select(col("id"), Wordpiece.greedyPieceCount(col("word"), vocab).as("n"))
      .orderBy("id").collect().map(_.getInt(1))
    words.zip(got).foreach { case (w, g) =>
      assert(g === naive(w, vocab.toSet), s"diverged on '$w'")
    }
  }

  test("chars-only vocab degenerates to word length; whole-word pieces compress") {
    val df = Seq((0L, "tabletable")).toDF("id", "word")
    val charsOnly = df.select(Wordpiece.greedyPieceCount(col("word"),
      Seq("t", "a", "b", "l", "e")).as("n")).head.getInt(0)
    assert(charsOnly === 10)
    val withWord = df.select(Wordpiece.greedyPieceCount(col("word"),
      Seq("t", "a", "b", "l", "e", "table")).as("n")).head.getInt(0)
    assert(withWord === 2)
  }

  test("OOV positions return the -1 sentinel (vocab contract violation is loud)") {
    val n = Seq((0L, "xyz")).toDF("id", "word")
      .select(Wordpiece.greedyPieceCount(col("word"), Seq("x", "y")).as("n"))
      .head.getInt(0)
    assert(n === -1)
  }

  test("trained vocab covers the corpus alphabet and caps at topV + alphabet") {
    val vocab = Subword.trainVocab(spark, sf, topV = 50, maxLen = 6)
    val alphabet = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(alphabet.subsetOf(vocab.toSet), s"missing chars: ${alphabet -- vocab.toSet}")
    assert(vocab.size <= 50 + alphabet.size)
    assert(vocab.exists(_.length > 1), "must learn multi-char pieces")
  }

  test("registered query: per-source rows, fertility in (1, max word length]") {
    val out = Subword.wordpieceStats(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) >= r.getLong(1), "pieces >= words")
      val fert = r.getDouble(3)
      assert(fert >= 1.0 && fert <= 10.0, s"fertility out of range: $fert")
    }
    // no -1 sentinel can survive into the sums: pieces strictly positive
    assert(out.forall(_.getLong(2) > 0))
  }

  test("apply is scan-local: the stats rollup is the only data exchange") {
    val df = Subword.wordpieceStats(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // train-side collects happen before this plan; the returned frame is
    // tokenize -> expression -> partial/final agg -> sort
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"apply side must shuffle only the rollup:\n$plan")
  }
}
