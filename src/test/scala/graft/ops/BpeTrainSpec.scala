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

  test("batched training with B=1 IS the sequential algorithm") {
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaaa", 4L), ("ab", 7L), ("xyzzy", 1L))
    val seq = BpeTrain.trainDriver(vocab, 12)
    val b1 = BpeTrain.trainDriverBatched(vocab, 12, b = 1, k = 4)
    assert(b1.map { case (_, l, r, f) => (l, r, f) } === seq)
    // with B=1 every pass accepts exactly one merge: pass == rank
    assert(b1.map(_._1) === (1 to b1.size))
  }

  test("batched driver and distributed paths learn IDENTICAL (pass, merge) sequences") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("banana", 4L), ("bandana", 2L), ("ananas", 3L))
    val df = words.toDF("word", "freq")
    val driver = BpeTrain.trainDriverBatched(words.toArray, 24, b = 4, k = 16)
    val dist = BpeTrain.trainDistributedBatched(df, 24, b = 4, k = 16)
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("greedy acceptance is symbol-disjoint within a pass and caps at B") {
    val cands = Seq(("e", "s", 9L), ("s", "t", 9L), ("w", "e", 8L),
      ("l", "o", 7L), ("o", "w", 7L), ("n", "e", 6L))
    val acc = BpeTrain.greedyAccept(cands, 3)
    // (e,s) accepted; (s,t) blocked on s; (w,e) blocked on e; (l,o)
    // accepted; (o,w) blocked on o and w; (n,e) blocked on e
    assert(acc === Seq(("e", "s", 9L), ("l", "o", 7L)))
    assert(BpeTrain.greedyAccept(cands, 1) === Seq(("e", "s", 9L)))
  }

  test("batched training on the corpus stays under N/8 passes and matches merge set") {
    val batched = BpeTrain.trainedMergesBatched(spark, sf, n = 256)
    assert(batched.nonEmpty)
    val passes = batched.map(_._1).max
    assert(passes <= 256 / 8, s"pass count $passes must be <= N/8 = 32")
    // every merge in the batched table has positive frequency and the
    // first pass starts from the same snapshot as sequential training:
    // its first accepted pair IS the sequential argmax
    val seq = BpeTrain.trainedMerges(spark, sf)
    assert(batched.head._1 === 1)
    assert((batched.head._2, batched.head._3, batched.head._4) === seq.head)
  }

  test("merge application fold == reference mergeOnce on overlap chains") {
    // aaaa with (a,a): LTR non-overlap -> [aa, aa]; then (aa,aa) -> [aaaa]
    assert(Bpe.mergeOnce(List("a", "a", "a", "a"), "a", "a") === List("aa", "aa"))
    assert(Bpe.mergeOnce(List("a", "a", "a"), "a", "a") === List("aa", "a"))
    assert(Bpe.mergeOnce(List("x", "x", "y", "y"), "x", "y") === List("x", "xy", "y"))
  }
}
