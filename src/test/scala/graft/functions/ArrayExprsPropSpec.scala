package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks of the native expressions against independent
  * Scala reference implementations. Expression `eval` is exercised
  * directly — no Spark jobs — so hundreds of generated cases stay fast.
  * (Raw scalacheck Gen + a sampling loop; the scalatestplus bridge
  * artifact is not in the offline cache.)
  */
class ArrayExprsPropSpec extends SparkTestBase {

  private val seed = org.scalacheck.rng.Seed(42L)
  private def cases[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Iterator.iterate(seed)(_.next).take(n)
      .flatMap(s => gen.apply(Gen.Parameters.default, s)).toSeq

  private def floatArrLit(a: Seq[Float]) =
    Literal.create(a.toArray, ArrayType(FloatType))
  private def strArrLit(a: Seq[String]) = Literal(
    new GenericArrayData(a.map(UTF8String.fromString).toArray),
    ArrayType(StringType))

  private val floatVec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
  private val tokenList = Gen.listOf(Gen.oneOf("a", "b", "cat", "dog", "x1", "yy"))

  test("dotF equals a left-fold reference for arbitrary float vectors") {
    cases(Gen.zip(floatVec, floatVec)).foreach { case (a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
      val got = ArrayExprs.DotProductF(floatArrLit(a), floatArrLit(b)).eval(null)
      assert(got === expected, s"a=$a b=$b")
    }
  }

  test("l2normF is non-negative and scales linearly") {
    cases(floatVec).foreach { a =>
      val n = ArrayExprs.L2NormF(floatArrLit(a)).eval(null).asInstanceOf[Double]
      assert(n >= 0.0)
      val n2 = ArrayExprs.L2NormF(floatArrLit(a.map(_ * 2))).eval(null).asInstanceOf[Double]
      assert(math.abs(n2 - 2 * n) < 1e-4 * (1 + n), s"a=$a")
    }
  }

  test("shingleHashes count equals distinct string shingles for any token list") {
    cases(tokenList).foreach { toks =>
      val got = ArrayExprs.ShingleHashes(strArrLit(toks), 3).eval(null)
        .asInstanceOf[ArrayData].numElements()
      val expected =
        if (toks.length < 3) 0 else toks.sliding(3).map(_.mkString(" ")).toSet.size
      // equality modulo 64-bit hash collisions (never hit in this space)
      assert(got === expected, s"toks=$toks")
    }
  }

  test("minHashSig is deterministic and bounded by the hash count") {
    cases(Gen.listOfN(12, Gen.identifier.map(_.take(6)))).foreach { toks =>
      val h = ArrayExprs.ShingleHashes(strArrLit(toks), 3)
      val sig = ArrayExprs.MinHashSig(h, 32).eval(null)
      val sig2 = ArrayExprs.MinHashSig(h, 32).eval(null)
      assert(sig.asInstanceOf[ArrayData].toLongArray().toSeq ===
        sig2.asInstanceOf[ArrayData].toLongArray().toSeq)
      assert(sig.asInstanceOf[ArrayData].numElements() === 32)
    }
  }

  test("simHash64 of a permuted token bag is unchanged (order-free votes)") {
    val rnd = new scala.util.Random(3)
    cases(tokenList).foreach { toks =>
      val a = ArrayExprs.SimHash64(strArrLit(toks)).eval(null)
      val b = ArrayExprs.SimHash64(strArrLit(rnd.shuffle(toks))).eval(null)
      assert(a === b, s"toks=$toks")
    }
  }

  test("mulmodP equals BigInt modular multiplication on the full range") {
    val p = BigInt((1L << 61) - 1)
    val gen = Gen.zip(Gen.chooseNum(0L, (1L << 61) - 2), Gen.chooseNum(0L, (1L << 61) - 2))
    cases(gen, 500).foreach { case (a, b) =>
      val expected = ((BigInt(a) * BigInt(b)) mod p).toLong
      assert(ArrayExprs.mulmodP(a, b) === expected, s"a=$a b=$b")
    }
  }

  test("minHashSigMd5 values are in [0, p); duplicate windows never change the sig") {
    val p = (1L << 61) - 1
    cases(tokenList.suchThat(_.size >= 3), 100).foreach { toks =>
      val sig = ArrayExprs.MinHashSigMd5(strArrLit(toks), 3, 16).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      assert(sig.forall(v => v >= 0 && v < p))
      // repeating the token list duplicates every window; min is unchanged
      val doubled = ArrayExprs.MinHashSigMd5(strArrLit(toks ++ toks), 3, 16).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      // doubled also contains the 2 bridge windows across the seam, so
      // its mins can only be <= the originals
      sig.zip(doubled).foreach { case (orig, dbl) => assert(dbl <= orig) }
    }
  }

  test("md5Mod is always in [0, m) and stable") {
    val gen = Gen.zip(Gen.alphaNumStr, Gen.chooseNum(1L, 1000003L))
    cases(gen, 300).foreach { case (s, m) =>
      val v1 = ArrayExprs.Md5Mod(Literal(UTF8String.fromString(s), StringType), m).eval(null)
        .asInstanceOf[Long]
      val v2 = ArrayExprs.Md5Mod(Literal(UTF8String.fromString(s), StringType), m).eval(null)
        .asInstanceOf[Long]
      assert(v1 === v2)
      assert(v1 >= 0 && v1 < m, s"s=$s m=$m v=$v1")
    }
  }

  test("sortedPairsN: ordered ids, ns sums, and the length filter is exactly min>=tau*max") {
    import org.apache.spark.sql.catalyst.InternalRow
    val entry = Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(1, 40))
    val gen = Gen.zip(Gen.listOfN(6, entry), Gen.oneOf(0.0, 0.3, 0.5, 0.8))
    cases(gen, 200).foreach { case (es0, tau) =>
      val es = es0.distinctBy(_._1)
      val arr = new GenericArrayData(es.map { case (id, n) => InternalRow(id, n) }.toArray)
      val lit = Literal(arr, ArrayType(StructType(Seq(
        StructField("id", LongType), StructField("n", IntegerType)))))
      val out = ArrayExprs.SortedPairsN(lit, tau).eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 3); (r.getLong(0), r.getLong(1), r.getInt(2))
      }
      val byId = es.toMap
      val expected = for {
        a <- es.map(_._1).sorted; b <- es.map(_._1).sorted if a < b
        na = byId(a); nb = byId(b)
        if math.min(na, nb) >= tau * math.max(na, nb)
      } yield (a, b, na + nb)
      assert(got.sorted === expected.sorted, s"es=$es tau=$tau")
      got.foreach { case (a, b, _) => assert(a < b) }
    }
  }
}
