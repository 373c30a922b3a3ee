package graft.ops

import graft.SparkTestBase
import graft.functions.FixLog2
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {

  test("log2Fix16: matches the DuckDB fold's values bit-for-bit") {
    // Vector computed by the DuckDB list_reduce fold (same algorithm)
    val expected = Seq(1L -> 0L, 2L -> 65536L, 3L -> 103872L, 5L -> 152169L,
      7L -> 183982L, 10L -> 217705L, 100L -> 435411L, 12345L -> 890741L,
      9999999999L -> 2177058L)
    expected.foreach { case (n, l) => assert(FixLog2.log2Fix16(n) == l, s"n=$n") }
  }

  test("log2Fix16: monotone and within 2^-16 of the true log") {
    var prev = -1L
    (1L to 4096L).foreach { n =>
      val l = FixLog2.log2Fix16(n)
      assert(l >= prev, s"not monotone at $n")
      prev = l
      val trueL = math.log(n.toDouble) / math.log(2.0)
      assert(math.abs(l / 65536.0 - trueL) < 2e-5 + 1.0 / 65536, s"off at $n")
    }
  }

  test("nbQuality: planted classes separate on held-out docs") {
    val rows = Dsir.nbQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    val heldOut = rows.filter(r => r.getAs[Long]("doc_id") % 5 == 4)
    assert(heldOut.nonEmpty, "no held-out docs")
    assert(heldOut.exists(_.getAs[String]("label") == "pos"), "no held-out pos docs")
    val acc = rows.count(r => r.getAs[String]("pred") == r.getAs[String]("label")).toDouble / rows.length
    assert(acc >= 0.9, s"accuracy $acc — planted signal not recovered")
    val hoAcc = heldOut.count(r => r.getAs[String]("pred") == r.getAs[String]("label")).toDouble / heldOut.length
    assert(hoAcc >= 0.9, s"held-out accuracy $hoAcc — classifier memorized, not generalized")
  }

  test("nbQuality: scores order the classes (mean pos above mean neg)") {
    val rows = Dsir.nbQuality(spark, sf).collect()
    val pos = rows.filter(_.getAs[String]("label") == "pos").map(_.getAs[Long]("score"))
    val neg = rows.filter(_.getAs[String]("label") == "neg").map(_.getAs[Long]("score"))
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.sum.toDouble / pos.length > neg.sum.toDouble / neg.length)
  }

  test("dsirResample: selects exactly N/4 docs and enriches the target class") {
    val docs = graft.catalog.Catalog(spark, sf).ref("documents")
    val n = docs.count()
    val sel = Dsir.dsirResample(spark, sf).collect()
    assert(sel.length == (n / 4).toInt)
    // planted pos prevalence is ~20%; selection should be enriched well above it
    val posIds = docs.select(col("doc_id"))
      .filter(graft.functions.ArrayExprs.md5Mod(
        concat(lit("nbq:"), col("doc_id").cast("string")), 5L) === 0)
      .collect().map(_.getLong(0)).toSet
    val selPos = sel.count(r => posIds.contains(r.getAs[Long]("doc_id")))
    val corpusFrac = posIds.size.toDouble / n
    val selFrac = selPos.toDouble / sel.length
    assert(selFrac > 2 * corpusFrac,
      s"selection not enriched: $selFrac vs corpus $corpusFrac")
  }

  test("Md5BucketDeltaSum: equals the explode+lookup relational formulation") {
    import spark.implicits._
    val deltas = Array.tabulate(64)(i => (i * 31 - 997).toLong)
    val df = Seq("alpha beta gamma", "delta epsilon", "alpha alpha zeta q")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    val viaExpr = df.select(
      graft.functions.Md5BucketDeltaSum(col("toks"), "t:", deltas.toSeq).as("s"))
      .collect().map(_.getLong(0))
    val lookup = deltas.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toSeq.toDF("bkt", "delta")
    val viaJoin = df.withColumn("id", monotonically_increasing_id())
      .select(col("id"), explode(col("toks")).as("w"))
      .withColumn("bkt", graft.functions.ArrayExprs.md5Mod(
        concat(lit("t:"), col("w")), 64L))
      .join(lookup, "bkt")
      .groupBy("id").agg(sum("delta").as("s"))
      .orderBy("id").collect().map(_.getAs[Long]("s"))
    assert(viaExpr.toSeq == viaJoin.toSeq)
  }
}
