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
  test("viterbi: matches brute-force enumeration of all segmentations") {
    import graft.functions.Viterbi
    val vocab = Map("a" -> 3L, "b" -> 1L, "ab" -> 5L, "ba" -> 2L, "aba" -> 6L, "bb" -> 4L)
    def enumerate(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to w.length).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p)) enumerate(w.substring(l)).map(p :: _) else Nil
      }
    val rnd = new scala.util.Random(61)
    val words = (0 until 150).map(_ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => "ab" (rnd.nextInt(2))).mkString)
    val got = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "word")
      .select(col("id"), Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .orderBy("id").collect()
      .map(r => (r.getStruct(1).getInt(0), r.getStruct(1).getLong(1)))
    words.zip(got).foreach { case (w, (n, score)) =>
      val segs = enumerate(w)
      assert(segs.nonEmpty)
      val best = segs.map(seg => (seg.map(vocab).sum, -seg.length)).max
      assert(score === best._1, s"'$w': score $score vs optimal ${best._1}")
      assert(n === -best._2, s"'$w': pieces $n vs optimal ${-best._2}")
    }
  }

  test("viterbi: equal-score ties resolve to fewer pieces") {
    import graft.functions.Viterbi
    val v = Seq((0L, "aa")).toDF("id", "word")
      .select(Viterbi.viterbiPieces(col("word"), Map("a" -> 1L, "aa" -> 2L)).as("v"))
      .head.getStruct(0)
    assert(v.getInt(0) === 1 && v.getLong(1) === 2L) // "aa" beats "a|a"
  }

  test("registered viterbi query: per-source rows; optimal never scores below single-chars") {
    val out = Subword.unigramViterbi(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
      assert(r.getLong(3) > 0L)
    }
    // cross-check against the scored vocab: for each word the DP result
    // must dominate the all-single-codepoints segmentation
    val vocab = Subword.trainScoredVocab(spark, sf, Subword.TopV, Subword.MaxPieceLen)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0))
    import graft.functions.Viterbi
    val res = words.toSeq.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "word")
      .select(col("word"), Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .collect()
    res.foreach { r =>
      val w = r.getString(0)
      val chars = (0 until w.codePointCount(0, w.length)).map { k =>
        val off = w.offsetByCodePoints(0, k)
        new String(Character.toChars(w.codePointAt(off)))
      }
      val charScore = chars.map(vocab).sum
      assert(r.getStruct(1).getLong(1) >= charScore,
        s"'$w': DP ${r.getStruct(1).getLong(1)} below single-char $charScore")
    }
  }
}
