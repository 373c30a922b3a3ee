package graft.ops

import graft.SparkTestBase
import graft.catalog.Catalog
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  /** Mean number of distinct files a predicate's rows span — the proxy
    * for files a min/max-pruning scan must touch.
    */
  private def meanFiles(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column): Double = {
    val per = df.groupBy(key).agg(countDistinct(col("file")).as("nf"))
      .collect().map(_.getAs[Long]("nf"))
    per.sum.toDouble / per.length
  }

  test("z-order bounds file footprints on BOTH dimensions at once") {
    val docs = Catalog(spark, sf).ref("documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val n = 16
    val none = Layout.writeLayout(spark, docs, tmpDir("zo-none"), n, "none")
    val bySrc = Layout.writeLayout(spark, docs, tmpDir("zo-src"), n, "source")
    val byZ = Layout.writeLayout(spark, docs, tmpDir("zo-z"), n, "zorder")
    // quartile bucket of the numeric dimension = the range-filter shape
    def qb(df: org.apache.spark.sql.DataFrame) = df.withColumn("cq", (col("n_chars") / 128).cast("int"))

    val srcNone = meanFiles(none, col("source"))
    val srcSorted = meanFiles(bySrc, col("source"))
    val srcZ = meanFiles(byZ, col("source"))
    val chNone = meanFiles(qb(none), col("cq"))
    val chSorted = meanFiles(qb(bySrc), col("cq"))
    val chZ = meanFiles(qb(byZ), col("cq"))

    // hash layout scatters both dimensions across ~every file
    assert(srcNone > n * 0.8 && chNone > n * 0.8,
      s"unsorted baseline should scatter: src=$srcNone chars=$chNone")
    // single-column sort is optimal on its own key but scatters the other
    assert(srcSorted < srcNone / 2, s"source sort must cluster source: $srcSorted")
    assert(chSorted > chZ,
      s"source sort must scatter n_chars worse than z-order: sorted=$chSorted z=$chZ")
    // the z-order claim: BOTH footprints strictly better than unsorted,
    // and the numeric dimension better than under the one-column sort
    assert(srcZ < srcNone / 2, s"z-order must cluster source: $srcZ vs $srcNone")
    assert(chZ < chNone / 2, s"z-order must cluster n_chars: $chZ vs $chNone")
  }

  test("z-values: de-interleaving recovers both normalized dimensions exactly") {
    val out = Layout.zvalue(spark, sf).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    out.foreach { r =>
      val z = r.getLong(3)
      var src = 0L; var c = 0L
      (0 until 8).foreach { b =>
        src |= ((z >> (2 * b + 1)) & 1L) << b
        c |= ((z >> (2 * b)) & 1L) << b
      }
      assert(src === r.getLong(1), s"src_bits de-interleave mismatch at $r")
      assert(c === r.getLong(2), s"c_bits de-interleave mismatch at $r")
      assert(src <= 255 && c <= 255, s"normalization overflowed 8 bits at $r")
    }
    // both normalized dimensions must actually spread over their range —
    // a constant dimension would make the interleave vacuous
    assert(out.map(_.getLong(1)).distinct.length > 10)
    assert(out.map(_.getLong(2)).distinct.length > 10)
  }

  test("withZValue: null dims bucket to 0 without corrupting the top rank; wide longs don't overflow") {
    import spark.implicits._
    // low-cardinality string dim WITH nulls: ranks must stay <= 255
    // (null excluded from the dictionary), null rows kept at bucket 0
    val strDf = Seq(Some("a"), Some("b"), Some("c"), None, Some("c"))
      .toDF("s").withColumn("id", monotonically_increasing_id())
    val strZ = Layout.withZValue(strDf, Seq("s"), "z").collect()
    assert(strZ.length === 5, "null-dim rows must never be dropped")
    val zByS = strZ.map(r => Option(r.getAs[String]("s")) -> r.getAs[Long]("z")).toMap
    assert(zByS(Some("c")) === 255L, "top rank must hit bucket 255 exactly")
    assert(zByS(None) === 0L, "null must normalize to bucket 0")
    assert(strZ.forall(_.getAs[Long]("z") <= 255L))
    // full-range long dim: (v - min) * 255 would overflow BIGINT; the
    // double path must still order min < mid < max
    val wide = Seq(Long.MinValue, 0L, Long.MaxValue).toDF("v")
    val wz = Layout.withZValue(wide, Seq("v"), "z").collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("z")).toMap
    assert(wz(Long.MinValue) === 0L)
    assert(wz(Long.MaxValue) === 255L)
    assert(wz(0L) > 0L && wz(0L) < 255L)
  }
}
