package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AugmentSpec extends SparkTestBase {

  test("upsample: dominant language gets exactly 1 copy; minorities get sqrt-scaled epochs") {
    val out = Augment.mixtureUpsample(spark, sf)
    val perLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmax = orig.values.max
    val top = orig.maxBy(_._2)._1
    assert(perLang(top) === orig(top), "dominant language must not upsample")
    orig.foreach { case (lang, n) =>
      val factor = perLang(lang).toDouble / n
      val target = math.sqrt(nmax.toDouble / n)
      // fractional epochs are a hash draw — allow slack around target
      assert(factor >= 1.0 && factor <= target + 1.0,
        s"$lang: factor $factor vs target $target")
      assert(factor >= target - 1.0, s"$lang under-replicated: $factor vs $target")
    }
    // copy indices are contiguous from 1 per doc
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("c"), max("copy_idx").as("m"))
    assert(byDoc.filter(col("c") =!= col("m")).count() === 0)
  }

  test("upsample is deterministic across runs") {
    val a = Augment.mixtureUpsample(spark, sf).collect().map(_.toString).toSeq
    val b = Augment.mixtureUpsample(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("fim: segments reassemble to the original text; cuts are proper") {
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Augment.fimTransform(spark, sf).collect()
    assert(out.nonEmpty)
    // roughly half the corpus is drawn
    assert(out.length > orig.size / 4 && out.length < orig.size * 3 / 4)
    out.foreach { r =>
      val t = r.getString(1)
      assert(t.startsWith("<PRE>"))
      val pre = t.substring(5, t.indexOf("<SUF>"))
      val suf = t.substring(t.indexOf("<SUF>") + 5, t.indexOf("<MID>"))
      val mid = t.substring(t.indexOf("<MID>") + 5)
      assert(pre + mid + suf === orig(r.getLong(0)),
        s"doc ${r.getLong(0)} does not reassemble")
      assert(pre.nonEmpty && mid.nonEmpty, "prefix and middle must be non-empty")
    }
  }

  test("both transforms are scan-shaped: no data shuffle before the presentation sort") {
    val fim = Augment.fimTransform(spark, sf).queryExecution.executedPlan.toString
    assert(!fim.contains("Exchange hashpartitioning"), s"FIM must not shuffle:\n$fim")
    val up = Augment.mixtureUpsample(spark, sf).queryExecution.executedPlan.toString
    // the lang-count aggregate is |langs| rows; the doc side must join it broadcast
    assert(up.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$up")
  }
}
