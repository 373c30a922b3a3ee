package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Native-expression correctness: each expression must agree with the
  * (slow) built-in higher-order-function formulation it replaced.
  */
class ArrayExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("dotF is bit-identical to the aggregate(zip_with(...)) fold") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.25f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(ArrayExprs.dotF(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("l2normF is bit-identical to sqrt(aggregate(...)) fold") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0.1f, 0.2f, 0.97f))).toDF("a")
    val hof = sqrt(aggregate(col("a"), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    df.select(ArrayExprs.l2normF(col("a")).as("n"), hof.as("h")).collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("dotF null semantics: length mismatch or null input -> null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),           // length mismatch
      (null.asInstanceOf[Array[Float]], Array(1.0f))
    ).toDF("a", "b")
    val out = df.select(ArrayExprs.dotF(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("shingleHashes: distinct count matches distinct string 3-shingles") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a", // repeated windows collapse
      "one two three",
      "too short")
    val df = docs.toDF("text").select(split(col("text"), " ").as("toks"))
    val counts = df.select(size(ArrayExprs.shingleHashes(col("toks"), 3)).as("n"))
      .as[Int].collect().toSeq
    val expected = docs.map { d =>
      val t = d.split(" ")
      if (t.length < 3) 0 else t.sliding(3).map(_.mkString(" ")).toSet.size
    }
    assert(counts === expected)
  }

  test("minHashSig: identical inputs agree, signature estimates Jaccard") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val df = Seq(a, a, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12").toDF("text")
      .select(ArrayExprs.minHashSig(
        ArrayExprs.shingleHashes(split(col("text"), " "), 3), 64).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))                       // identical docs
    assert(sigs(0).length === 64)
    val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(agree < 8, s"disjoint docs should share almost no minhashes, got $agree")
  }

  test("simHash64: deterministic; near-dup hamming << disjoint hamming") {
    def fp(s: String): Long =
      Seq(s).toDF("text").select(ArrayExprs.simHash64(split(col("text"), " ")))
        .as[Long].head()
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val near = base + "extra"
    val other = "uno dos tres cuatro cinco seis siete ocho nueve diez " * 3
    assert(fp(base) === fp(base))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(base), fp(near)) < hamming(fp(base), fp(other)))
  }

  test("sortedPairs: all ordered pairs, sorted, empty below two elements") {
    val df = Seq(Seq(5L, 1L, 3L), Seq(7L), Seq.empty[Long])
      .toDF("ids")
      .select(ArrayExprs.sortedPairs(col("ids")).as("ps"))
    val rows = df.collect().map(_.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1))))
    assert(rows(0) === Seq((1L, 3L), (1L, 5L), (3L, 5L)))
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
  }

  test("lshBuckets: deterministic, one bucket per table, close vectors collide") {
    val v = Array.tabulate(16)(i => (i + 1).toFloat)
    val nearlyV = v.clone(); nearlyV(0) = v(0) + 0.001f
    val df = Seq(Tuple1(v), Tuple1(v), Tuple1(nearlyV)).toDF("vec")
      .select(ArrayExprs.lshBuckets(col("vec"), 4, 8).as("b"))
    val bs = df.as[Seq[Long]].collect()
    assert(bs(0) === bs(1))
    assert(bs(0).length === 4)
    assert(bs(0) === bs(2), "epsilon-perturbed vector must hash to the same buckets")
  }

  test("sortedPairsN: pairs ordered by id, ns = n1+n2, length filter exact") {
    val df = Seq(Tuple1(Seq((5L, 10), (1L, 4), (3L, 9))))
      .toDF("docs")
      .select(
        ArrayExprs.sortedPairsN(col("docs").cast("array<struct<id:bigint,n:int>>")).as("all"),
        ArrayExprs.sortedPairsN(col("docs").cast("array<struct<id:bigint,n:int>>"), 0.5).as("filtered"))
    val row = df.head()
    def triples(i: Int) = row.getSeq[Row](i).map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(triples(0) === Seq((1L, 3L, 13), (1L, 5L, 14), (3L, 5L, 19)))
    // τ=0.5 drops (1,5): min(4,10)=4 < 0.5*10 — Jaccard can never reach τ.
    // (1,3): min(4,9)=4 < 4.5 dropped too; (3,5): 9 >= 5 kept.
    assert(triples(1) === Seq((3L, 5L, 19)))
  }

  test("probePairsBoth: emits exactly the pairs whose lex-min side probes") {
    // (id, n, probe): min side by (n, id); pair emitted iff that side's probe
    val docs = Seq((1L, 4, true), (2L, 4, false), (3L, 9, false), (4L, 2, false))
    val df = Seq(Tuple1(docs)).toDF("docs")
      .select(ArrayExprs.probePairsBoth(
        col("docs").cast("array<struct<doc_id:bigint,n:int,probe:boolean>>")).as("ps"))
    val got = df.head().getSeq[Row](0)
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // (1,2): tie n=4, lex-min is id 1 (probe) -> emit. (1,3): min is 1 -> emit.
    // (1,4): min is 4 (n=2, no probe) -> drop. (2,3): min 2 no probe -> drop.
    // (2,4)/(3,4): min is 4, no probe -> drop.
    assert(got === Set((1L, 2L, 4, 4), (1L, 3L, 4, 9)))
  }

  test("probePairsBoth gate is lossless vs sortedPairsBoth for containment >= tau") {
    // brute-force check on a random corpus: candidates surviving the
    // prefix gate must include EVERY pair whose true containment >= tau
    val rnd = new scala.util.Random(7)
    val tau = 0.9
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(12)
      val shingles = Seq.fill(n)(rnd.nextInt(30).toLong).distinct.sorted
      (id, shingles)
    }
    val k = docs.map { case (id, sh) =>
      id -> (sh.length - math.ceil(tau * sh.length).toInt + 1)
    }.toMap
    val byShingle = docs.flatMap { case (id, sh) =>
      sh.zipWithIndex.map { case (s, pos) => (s, id, sh.length, pos < k(id)) }
    }.groupBy(_._1).values.filter(_.length > 1)
    val gated = byShingle.flatMap { posting =>
      for {
        a <- posting; b <- posting if a._2 < b._2
        aMin = a._3 < b._3 || (a._3 == b._3 && a._2 < b._2)
        if (if (aMin) a._4 else b._4)
      } yield (a._2, b._2)
    }.toSet
    val setOf = docs.toMap
    for { (a, sa) <- docs; (b, sb) <- docs if a < b } {
      val inter = sa.toSet.intersect(sb.toSet).size
      val cont = inter.toDouble / math.min(sa.length, sb.length)
      if (cont >= tau)
        assert(gated((a, b)),
          s"prefix gate dropped a true pair ($a,$b) cont=$cont sa=$sa sb=$sb")
    }
    assert(setOf.size === 40)
  }

  test("sortedIntersectCount: merge count over sorted arrays, null intolerant") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)))
      .toDF("a", "b")
      .select(ArrayExprs.sortedIntersectCount(col("a"), col("b")).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(2, 0, 1))
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(ArrayExprs.sortedIntersectCount(col("a"), col("b")).as("n"))
    assert(withNull.head().isNullAt(0))
  }

  test("md5Lower64 matches DuckDB md5_number_lower (pinned cross-engine values)") {
    // duckdb> SELECT md5_number_lower('abc'), md5_number_lower('');
    assert(ArrayExprs.md5Lower64("abc".getBytes("UTF-8")) === 8250560606382298838L)
    assert(ArrayExprs.md5Lower64("".getBytes("UTF-8")) === 9098107892288553193L)
  }

  test("permParams match the DuckDB derivation (pinned i=0..1)") {
    // duckdb> SELECT i, md5_number_lower(concat('a',i)) % (2^61-2) + 1,
    //                  md5_number_lower(concat('b',i)) % (2^61-1) FROM range(2) t(i)
    val (a, b) = ArrayExprs.permParams(2)
    assert(a(0) === 1888732864723072872L && b(0) === 705743069918847172L)
    assert(a(1) === 168612321685911460L && b(1) === 6373927829658L)
  }

  test("minHashSigMd5: matches a by-hand md5+permutation reference; null below n tokens") {
    import java.security.MessageDigest
    val toksList = Seq("the", "quick", "brown", "fox", "jumps")
    val p = (1L << 61) - 1
    def md5l(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (7 to 0 by -1).foldLeft(0L)((h, j) => (h << 8) | (d(8 + j) & 0xffL))
    }
    val (pa, pb) = ArrayExprs.permParams(8)
    val expected = (0 until 8).map { q =>
      toksList.sliding(3).map(_.mkString(" ")).map { sh =>
        val h = java.lang.Long.remainderUnsigned(md5l(sh), p)
        // BigInt reference for the mulmod
        ((BigInt(pa(q)) * h + pb(q)) % p).toLong
      }.min
    }
    val got = Seq(Tuple1(toksList), Tuple1(Seq("too", "few")))
      .toDF("toks")
      .select(ArrayExprs.minHashSigMd5(col("toks"), 3, 8).as("sig"))
      .collect()
    assert(got(0).getSeq[Long](0) === expected)
    assert(got(1).isNullAt(0), "fewer than n tokens must yield a null signature")
  }

  test("nearestCentroid(+Sq): a dimension-mismatched embedding fails loudly") {
    val cents = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
    val centsD = cents.map(_.map(_.toDouble))
    // Well-formed rows assign; a malformed (2-dim vs 3-dim) row must
    // throw, never silently score a truncated prefix.
    val ok = Seq(Tuple1(Array(0.9f, 0.1f, 0.0f))).toDF("v")
    assert(ok.select(ArrayExprs.nearestCentroid(col("v"), cents)).head().getInt(0) === 0)
    assert(ok.select(ArrayExprs.nearestCentroidSq(col("v"), centsD)("cid")).head().getInt(0) === 0)
    // Depending on whether the local relation folds on the driver or
    // runs in a task, the IllegalArgumentException may arrive bare or
    // wrapped in a SparkException — either way it must surface.
    def rootMessages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
        .map(x => Option(x.getMessage).getOrElse(""))
    val bad = Seq(Tuple1(Array(0.9f, 0.1f))).toDF("v")
    val e1 = intercept[Exception] {
      bad.select(ArrayExprs.nearestCentroid(col("v"), cents)).collect()
    }
    assert(rootMessages(e1).exists(_.contains("dimension")))
    val e2 = intercept[Exception] {
      bad.select(ArrayExprs.nearestCentroidSq(col("v"), centsD)).collect()
    }
    assert(rootMessages(e2).exists(_.contains("dimension")))
  }

  test("simHash64Md5: order-free and equals a by-hand vote reference") {
    import java.security.MessageDigest
    def md5l(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (7 to 0 by -1).foldLeft(0L)((h, j) => (h << 8) | (d(8 + j) & 0xffL))
    }
    val toksList = Seq("alpha", "beta", "gamma", "beta")
    val votes = Array.fill(64)(0)
    toksList.foreach { t =>
      val h = md5l(t)
      (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
    }
    val expected = (0 until 64).foldLeft(0L)((fp, b) => if (votes(b) > 0) fp | (1L << b) else fp)
    val got = Seq(Tuple1(toksList), Tuple1(toksList.reverse)).toDF("toks")
      .select(ArrayExprs.simHash64Md5(col("toks")).as("fp"))
      .collect().map(_.getLong(0))
    assert(got(0) === expected)
    assert(got(1) === expected, "simhash must be order-free")
  }

  test("minCoverSpan: two-pointer minimal window equals the brute-force cover over random event lists; missing slot is null") {
    val rnd = new scala.util.Random(42)
    def brute(events: Seq[(Int, Int)], slots: Int): Option[Int] = {
      val bySlot = (0 until slots).map(s => events.filter(_._2 == s).map(_._1))
      if (bySlot.exists(_.isEmpty)) None
      else {
        // min over the position cross product of (max - min) — the
        // definition (the DuckDB twin's form)
        def combos(ls: Seq[Seq[Int]]): Seq[Seq[Int]] =
          ls.foldLeft(Seq(Seq.empty[Int]))((acc, l) => acc.flatMap(c => l.map(c :+ _)))
        Some(combos(bySlot).map(c => c.max - c.min).min)
      }
    }
    (1 to 60).foreach { trial =>
      val slots = 1 + rnd.nextInt(4)
      val n = 1 + rnd.nextInt(12)
      val events = Seq.fill(n)((1 + rnd.nextInt(30), rnd.nextInt(slots)))
      val packed = events.map { case (p, s) => p.toLong * 64 + s }.sorted
      val got = Seq(Tuple1(packed)).toDF("ev")
        .select(ArrayExprs.minCoverSpan(col("ev"), slots).as("span"))
        .collect().head
      val want = brute(events, slots)
      assert((if (got.isNullAt(0)) None else Some(got.getInt(0))) === want,
        s"trial $trial: slots=$slots events=$events")
    }
    // same position carrying two slots: a zero-width window covers
    val z = Seq(Tuple1(Seq(5L * 64 + 0, 5L * 64 + 1)))
      .toDF("ev").select(ArrayExprs.minCoverSpan(col("ev"), 2)).collect().head
    assert(z.getInt(0) === 0)
  }
}
