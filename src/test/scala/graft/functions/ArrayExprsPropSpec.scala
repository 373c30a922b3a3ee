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
}
