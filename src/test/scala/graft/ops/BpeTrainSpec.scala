package graft.ops

import graft.SparkTestBase
import graft.functions.Bpe

class BpeTrainSpec extends SparkTestBase {

  test("driver trainer learns the textbook merges with the documented tie-break") {
    // Sennrich's running example shape: corpus where 'lo' dominates, then
    // ties force the lexicographic break
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTrain.trainDriver(vocab, 4)
    // pair counts round 1: (l,o)=7, (o,w)=7, (e,s)=9, (s,t)=9, (w,e)=8, ...
    // best = 9 with tie (e,s) vs (s,t) -> lexicographically smaller (e,s)
    assert(merges.head === ("e", "s", 9L))
    assert(merges(1) === ("es", "t", 9L))
    assert(merges.map(_._1).nonEmpty && merges.size === 4)
  }

  test("driver and distributed trainers learn IDENTICAL merges") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaaa", 4L), ("ab", 7L), ("xyzzy", 1L))
    val df = words.toDF("word", "freq")
    val driver = BpeTrain.trainDriver(words.toArray, 6)
    val dist = BpeTrain.trainDistributed(df, 6)
    assert(driver === dist)
  }

  test("training exhausts gracefully when the vocabulary runs dry") {
    val merges = BpeTrain.trainDriver(Array(("ab", 3L)), 10)
    assert(merges === Seq(("a", "b", 3L)))
    assert(BpeTrain.trainDriver(Array(("x", 3L)), 10) === Seq.empty)
  }

  test("trained table drives BpeCountSum: corpus words tokenize to fewer pieces") {
    val merges = BpeTrain.trainedMerges(spark, sf)
    assert(merges.nonEmpty, "sf0.001 corpus must yield merges")
    // ranks strictly ordered by the training sequence; pair freqs positive
    assert(merges.forall(_._3 > 0))
    val table = merges.map { case (l, r, _) => (l, r) }.toIndexedSeq
    val ranks = table.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    // a word assembled from the corpus' own top merge must compress
    val (l0, r0, _) = merges.head
    val w = l0 + r0
    assert(Bpe.count(w, table, ranks) < w.length,
      s"top trained merge must compress its own pair: $w")
  }

  test("merge application fold == reference mergeOnce on overlap chains") {
    // aaaa with (a,a): LTR non-overlap -> [aa, aa]; then (aa,aa) -> [aaaa]
    assert(Bpe.mergeOnce(List("a", "a", "a", "a"), "a", "a") === List("aa", "aa"))
    assert(Bpe.mergeOnce(List("a", "a", "a"), "a", "a") === List("aa", "a"))
    assert(Bpe.mergeOnce(List("x", "x", "y", "y"), "x", "y") === List("x", "xy", "y"))
  }
}
