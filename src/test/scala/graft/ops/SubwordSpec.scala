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
    // the planted ≥WindowCp-cp words ride the ORACLE-CHECKED path: their
    // source row is present with both long words counted
    val planted = out.find(_.getString(0) == Subword.LongWordSource)
    assert(planted.exists(_.getLong(1) === 2L),
      s"planted long-word source missing from the registered query: ${out.map(_.getString(0)).toSeq}")
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

  /** Driver-side reference for the WINDOWED segmentation: split into
    * [[graft.functions.Viterbi.WindowCp]]-cp windows, brute-DP each
    * (max score, then fewest pieces), sum across windows; None when a
    * window is unreachable — exactly the expression's documented
    * contract, derived independently of its packed-long arithmetic.
    */
  private def windowedRef(word: String, vocab: Map[String, Long]): Option[(Int, Long)] = {
    val w = graft.functions.Viterbi.WindowCp
    val cps = word.codePoints().toArray
    val maxLen = vocab.keys.map(p => p.codePointCount(0, p.length)).max
    def dpWindow(off: Int, n: Int): Option[(Int, Long)] = {
      // best(i) = (score, -pieces) lexicographic max over segmentations of cps[off, off+i)
      val best = Array.fill[Option[(Long, Int)]](n + 1)(None)
      best(0) = Some((0L, 0))
      for (i <- 1 to n; j <- 1 to math.min(maxLen, i); prev <- best(i - j);
           s <- vocab.get(new String(cps, off + i - j, j))) {
        val cand = (prev._1 + s, prev._2 - 1)
        import scala.math.Ordering.Implicits._
        if (best(i).forall(b => cand > b)) best(i) = Some(cand)
      }
      best(n).map { case (score, negN) => (-negN, score) }
    }
    val windows = Iterator.range(0, cps.length, w)
      .map(off => dpWindow(off, math.min(w, cps.length - off))).toSeq
    if (cps.isEmpty) Some((0, 0L))
    else if (windows.exists(_.isEmpty)) None
    else Some((windows.map(_.get._1).sum, windows.map(_.get._2).sum))
  }

  private def viterbiOne(word: String, vocab: Map[String, Long]): (Int, Long) = {
    val v = Seq(Tuple1(word)).toDF("word")
      .select(graft.functions.Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .head.getStruct(0)
    (v.getInt(0), v.getLong(1))
  }

  test("viterbi windowed long words: boundary approximation, exact mid-range, loud unreachable") {
    val vocab = Map("a" -> 1L, "aa" -> 3L)
    // 64 cp: windows [63, 1]; window 1 forces a lone 'a' the global
    // optimum (32×"aa" = 32 pieces / 96) would avoid — documents the
    // boundary approximation: (33, 95)
    assert(viterbiOne("a" * 64, vocab) === ((33, 95L)))
    assert(windowedRef("a" * 64, vocab) === Some((33, 95L)))
    // 40 cp: a single window — EXACT DP, beyond the old 16-step oracle
    assert(viterbiOne("a" * 40, vocab) === ((20, 60L)))
    // 130 cp, zero-score vocab: windows [63, 63, 4], all singles
    assert(viterbiOne("a" * 130, Map("a" -> 0L)) === ((130, 0L)))
    // unreachable inside the SECOND window -> whole-word sentinel
    assert(viterbiOne("a" * 70 + "z", vocab) === ((-1, -1L)))
    assert(windowedRef("a" * 70 + "z", vocab) === None)
    // randomized agreement engine vs driver reference across the window
    // boundary, mixed piece lengths
    val rnd = new scala.util.Random(73)
    val rvocab = Map("a" -> 2L, "b" -> 1L, "ab" -> 5L, "ba" -> 4L, "aab" -> 9L)
    (0 until 40).foreach { _ =>
      val w = (0 until (50 + rnd.nextInt(120))).map(_ => "ab"(rnd.nextInt(2))).mkString
      val got = viterbiOne(w, rvocab)
      val ref = windowedRef(w, rvocab).getOrElse((-1, -1L))
      assert(got === ref, s"windowed mismatch on ${w.length}-cp word")
    }
  }

  /** Driver-side shortest-piece backwalk over the same windowed DP —
    * the independent reference for [[graft.functions
    * .ViterbiSegmentPieces]] and the EM E-step.
    */
  private def segmentRef(word: String, vocab: Map[String, Long]): Option[Seq[String]] = {
    val w = graft.functions.Viterbi.WindowCp
    val cps = word.codePoints().toArray
    val maxLen = vocab.keys.map(p => p.codePointCount(0, p.length)).max
    def window(off: Int, n: Int): Option[Seq[String]] = {
      val NEG = Long.MinValue
      val best = Array.fill(n + 1)(NEG)
      best(0) = 0L
      for (i <- 1 to n; j <- 1 to math.min(maxLen, i) if best(i - j) != NEG;
           s <- vocab.get(new String(cps, off + i - j, j))) {
        val cand = best(i - j) + s * 64L - 1L
        if (cand > best(i)) best(i) = cand
      }
      if (best(n) == NEG) return None
      var pos = n
      val rev = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) {
        val j = (1 to math.min(maxLen, pos)).find { j =>
          best(pos - j) != NEG && vocab.get(new String(cps, off + pos - j, j))
            .exists(s => best(pos - j) + s * 64L - 1L == best(pos))
        }.get
        rev += new String(cps, off + pos - j, j)
        pos -= j
      }
      Some(rev.toSeq.reverse)
    }
    val windows = Iterator.range(0, cps.length, w)
      .map(off => window(off, math.min(w, cps.length - off))).toSeq
    if (windows.exists(_.isEmpty)) None else Some(windows.flatMap(_.get))
  }

  test("viterbiSegmentPieces: pieces reassemble the word and agree with the stats expression") {
    import graft.functions.Viterbi
    val vocab = Map("a" -> 2L, "b" -> 1L, "ab" -> 5L, "ba" -> 4L, "aab" -> 9L, "bb" -> 3L)
    val rnd = new scala.util.Random(59)
    val words = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(100))).map(_ => "ab"(rnd.nextInt(2))).mkString)
    val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "word")
      .select(col("id"), col("word"),
        Viterbi.viterbiSegmentPieces(col("word"), vocab).as("pieces"),
        Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .orderBy("id").collect()
    rows.foreach { r =>
      val (w, pieces) = (r.getString(1), r.getSeq[String](2))
      assert(pieces.mkString === w, s"pieces must reassemble '$w'")
      assert(pieces.length === r.getStruct(3).getInt(0),
        s"'$w': piece count disagrees with the stats expression")
      assert(pieces.map(vocab).sum === r.getStruct(3).getLong(1),
        s"'$w': piece scores disagree with the stats expression")
      assert(pieces === segmentRef(w, vocab).get, s"'$w': backwalk tie-break drifted")
    }
  }

  test("EM: distributed training equals the driver reference; likelihood improves monotonically") {
    import graft.functions.FixLog2
    val vocabs = Subword.emVocabs(spark, sf, rounds = 3)
    assert(vocabs.length === 4)
    // driver reference EM from the same seed — over the corpus PLUS the
    // planted long-word doc the registered unigram queries union in
    val words = (spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0))
      ++ Subword.LongWordText.split(" "))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val singles = vocabs.head.keySet.filter(p => p.codePointCount(0, p.length) == 1)
    var vref = vocabs.head
    (1 to 3).foreach { r =>
      val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      words.foreach { case (w, f) =>
        segmentRef(w, vref).get.foreach(p => counts(p) += f)
      }
      val lt = FixLog2.log2Fix16(counts.values.sum)
      vref = (counts.keySet ++ singles).iterator.map { p =>
        p -> (FixLog2.log2Fix16(math.max(counts(p), 1L)) - lt)
      }.toMap
      assert(vocabs(r) === vref, s"round $r: distributed vocab != driver reference")
      // pruning: unused multi-codepoint pieces disappear, singles never do
      assert(singles.subsetOf(vocabs(r).keySet))
    }
    // hard-EM monotonicity in the shared normalized score space:
    // L_r = corpus-optimal total log-probability under model r
    def likelihood(vocab: Map[String, Long]): Long =
      words.iterator.map { case (w, f) =>
        val pieces = segmentRef(w, vocab).get
        f * pieces.map(vocab).sum
      }.sum
    val l = (1 to 3).map(r => likelihood(vocabs(r)))
    assert(l(0) <= l(1) && l(1) <= l(2),
      s"EM likelihood must not degrade: $l")
  }

  test("registered viterbi query matches the windowed driver reference on a long-word corpus") {
    val d = tmpDir("subword_longword")
    Seq(
      (1L, "the " + "x" * 130 + " scan and " + "y" * 70 + " merge", "src0"),
      (2L, "z" * 40 + " spark " + "x" * 130, "src1"),
      (3L, "plain short words only here", "src0"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    // the registered query trains on the corpus PLUS its own planted
    // long-word doc; emVocabs' seed (rounds = 0) is exactly that vocab
    val vocab = Subword.emVocabs(spark, d, rounds = 0).head
    val got = Subword.unigramViterbi(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver reference over the same tokenization, planted doc included
    val words = Seq(
      ("src0", "the " + "x" * 130 + " scan and " + "y" * 70 + " merge"),
      ("src1", "z" * 40 + " spark " + "x" * 130),
      ("src0", "plain short words only here"),
      (Subword.LongWordSource, Subword.LongWordText))
      .flatMap { case (s, t) => t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(s -> _) }
    val expect = words.groupBy(_._1).map { case (s, ws) =>
      val refs = ws.map(w => windowedRef(w._2, vocab).get)
      s -> ((ws.size.toLong, refs.map(_._1.toLong).sum, refs.map(_._2).sum))
    }
    assert(got === expect, s"engine $got vs driver reference $expect")
  }
}
