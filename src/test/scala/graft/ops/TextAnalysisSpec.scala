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

  test("mixtureSample: flattens toward uniform, smallest group kept whole, deterministic") {
    // the mixture groups by the CLASSIFIER's language (end-to-end
    // routing), so the expected group sizes come from langId, not the
    // metadata lang column
    val byLang = TextAnalysis.langId(spark, sf)
      .groupBy(col("predicted_lang")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val rows = TextAnalysis.mixtureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val ppmByLang = rows.map(r => (r._2, r._3)).toMap
    // bigger groups must get lower (or equal) keep rates — the
    // flattening. w = ⌊√n⌋ is step-wise, so two groups within the same
    // ~2√n-wide sqrt bucket can legitimately swap by a floor step;
    // assert monotonicity only where the √ effect dominates that
    // granularity (nb beyond na's bucket), with ppm-floor slack.
    for ((la, na) <- byLang; (lb, nb) <- byLang
         if nb > na + 2 * math.sqrt(na.toDouble) + 2)
      assert(ppmByLang.getOrElse(la, 1000000L) + 2000L >= ppmByLang.getOrElse(lb, 0L),
        s"$la (n=$na) must keep at a rate >= $lb (n=$nb)")
    // the binding group (argmin n·W/w — the smallest up to ⌊√n⌋ steps)
    // is kept whole minus at most ~2 docs of floor loss: each of the
    // three floors (T, k, ppm) costs at most one doc's worth of rate,
    // i.e. 10⁶/n ppm — significant only for small groups
    val nMin = byLang.values.min
    val floorLoss = 2L * 1000000L / nMin + 1
    assert(ppmByLang.values.max >= 1000000L - floorLoss,
      s"some group must bind the total and be kept ~whole: $ppmByLang")
    val smallest = byLang.minBy(_._2)._1
    assert(ppmByLang(smallest) >= 1000000L - 4L * floorLoss,
      s"smallest group $smallest must be kept near-whole, got ${ppmByLang(smallest)} ppm")
    // kept counts track the integer rates (hash draw is uniform; allow
    // generous slack for a small corpus)
    rows.groupBy(_._2).foreach { case (lang, grp) =>
      val expected = byLang(lang) * ppmByLang(lang) / 1000000.0
      assert(math.abs(grp.length - expected) <= math.max(6.0, 0.35 * expected),
        s"$lang kept ${grp.length}, expected ~$expected")
    }
    val again = TextAnalysis.mixtureSample(spark, sf).collect().map(_.getLong(0))
    assert(rows.map(_._1).toSeq === again.toSeq, "hash-draw sample must be stable")
  }

  test("bigramLm: singleton pruning zeroes unique text, coverage bounded, repeats score high") {
    val rows = TextAnalysis.bigramLm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    val c = graft.catalog.Catalog(spark, sf)
    assert(rows.length === c.ref("documents").count(), "one score row per document")
    rows.foreach { case (id, nBg, nKnown, cov) =>
      assert(nKnown <= nBg, s"doc $id: known $nKnown > total $nBg")
      if (nBg > 0) {
        assert(cov >= 0.0 && cov <= 1.0, s"doc $id coverage $cov out of range")
        assert(math.abs(cov - nKnown.toDouble / nBg) < 1e-12)
      } else assert(cov.isNaN, s"doc $id: zero bigrams must yield null coverage")
    }
    // a bigram that occurs corpus-wide only once (inside one doc) is
    // pruned from the model, so a doc of globally-unique gibberish
    // scores zero coverage while a doc made of one repeated bigram pair
    // scores full coverage — pin both on a tiny synthetic corpus
    import spark.implicits._
    val tiny = Seq(
      (1L, "zqx wvu tsr qpo nml"),            // all bigrams unique corpus-wide
      (2L, "alpha beta alpha beta alpha"),    // repeated bigrams
      (3L, "beta alpha beta alpha"))          // shares doc 2's bigrams
      .toDF("doc_id", "text")
    tiny.createOrReplaceTempView("__bigram_tiny")
    val toks = TextAnalysis.tokens(lower(col("text")))
    val bg = tiny.select(col("doc_id"),
      explode(when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array())).as("bigram"))
    val model = bg.groupBy("bigram").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    val m = bg.join(model, Seq("bigram"), "left").groupBy("doc_id")
      .agg(count(lit(1)).as("nb"), count(col("n")).as("nk")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L)._2 === 0L, "globally-unique bigrams must be pruned")
    assert(m(2L)._2 === m(2L)._1, "repeated bigrams must be fully known")
    assert(m(3L)._2 === m(3L)._1, "cross-doc shared bigrams must be known")
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

  test("gopherRules: conjunction is exact, fixture discriminates on multiple rules") {
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val ruleCols = Seq("r_len", "r_wordlen", "r_stop", "r_rep", "r_ttr")
    val idx = ruleCols.map(c => c -> rows.head.fieldIndex(c)).toMap
    val passIdx = rows.head.fieldIndex("pass")
    rows.foreach { r =>
      val expect = ruleCols.forall(c => r.getBoolean(idx(c)))
      assert(r.getBoolean(passIdx) === expect, s"pass must be the AND of the rules: $r")
    }
    val passes = rows.count(_.getBoolean(passIdx))
    assert(passes > 0 && passes < rows.length,
      s"fixture must have both keepers and rejects, got $passes/${rows.length}")
    val discriminating = ruleCols.count { c =>
      val vs = rows.map(_.getBoolean(idx(c))).toSet; vs.size == 2
    }
    assert(discriminating >= 2,
      s"at least two rules must fire both ways on the fixture ($discriminating did)")
  }

  test("weighted sample: exactly k rows, biased toward heavy documents, partition-invariant") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.weightedSampleAt(spark, sf, k = 100).collect()
    assert(out.length === 100)
    assert(out.map(_.getLong(0)).distinct.length === 100, "without replacement")
    // A-ES guarantee: inclusion probability rises with weight, so the
    // sampled mean weight must sit clearly above the corpus mean
    val sampledMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = graft.catalog.Catalog(spark, sf).ref("documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampledMean > corpusMean * 1.05,
      s"sample not weight-biased: sampled=$sampledMean corpus=$corpusMean")
    // the draw is a pure function of doc_id, so the sample cannot depend
    // on physical layout — same result after an arbitrary repartition
    val ids = out.map(_.getLong(0)).toSet
    val reShuffled = TextAnalysis.weightedSampleOn(
      graft.catalog.Catalog(spark, sf).ref("documents").repartition(13), k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(reShuffled === ids)
  }

  test("grouped weighted sample: k rows for every source, ranks dense from 1") {
    val out = TextAnalysis.weightedSampleGroupedAt(spark, sf, kPerGroup = 3)
      .collect()
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.size > 1)
    bySource.foreach { case (src, rows) =>
      assert(rows.length === 3, s"$src must contribute exactly k rows")
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
    }
    assert(out.map(_.getLong(2)).distinct.length === out.length,
      "without replacement across the whole sample")
  }
}
