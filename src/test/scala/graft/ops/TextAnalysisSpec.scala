package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  test("stratifiedSample: deterministic, rate-bounded per source, a true subset") {
    val s1 = TextAnalysis.stratifiedSample(spark, sf).collect()
    val s2 = TextAnalysis.stratifiedSample(spark, sf).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq,
      "hash-draw sample must be identical across runs")
    val c = graft.catalog.Catalog(spark, sf)
    val all = c.ref("documents").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).forall(all.contains))
    // ~10% draw: loose bounds that hold w.h.p. for any real corpus size
    val rate = s1.length.toDouble / all.size
    assert(rate > 0.02 && rate < 0.25, s"sample rate $rate implausible for a 10% draw")
    // membership is decided per (source, doc_id): changing the permille
    // monotonically grows the sample
    val bigger = TextAnalysis.stratifiedSampleAt(spark, sf, permille = 300)
      .collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).toSet.subsetOf(bigger),
      "a larger rate must keep every previously sampled doc")
  }

  test("splitAssign: total partition, ~98/1/1, stable, independent of row order") {
    val rows = TextAnalysis.splitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val c = graft.catalog.Catalog(spark, sf)
    assert(rows.length === c.ref("documents").count())
    val frac = rows.count(_._2 == "train").toDouble / rows.length
    assert(frac > 0.90 && frac <= 1.0, s"train fraction $frac")
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    val again = TextAnalysis.splitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("sourceQuota: at most quota docs per source, hash-deterministic picks") {
    val rows = TextAnalysis.sourceQuotaAt(spark, sf, quota = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    rows.groupBy(_._2).foreach { case (_, grp) =>
      assert(grp.length <= 5)
      assert(grp.map(_._3).sorted.toSeq === (1 to grp.length))
    }
    // growing the quota keeps every previously picked doc (prefix property)
    val bigger = TextAnalysis.sourceQuotaAt(spark, sf, quota = 10).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet.subsetOf(bigger))
  }

  test("vocabTopK: per-source ranks contiguous, counts non-increasing, ties lexical") {
    val rows = TextAnalysis.vocabTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      val ns = sorted.map(_.getLong(3))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        "counts must be non-increasing with rank")
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getLong(3) == b.getLong(3) =>
          assert(a.getString(2) < b.getString(2), "equal counts must order by bigram")
        case _ => ()
      }
    }
  }
}
