package graft.ops

import graft.SparkTestBase
import graft.catalog.Catalog
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  private def occOf(part: org.apache.spark.sql.DataFrame) = part
    .select(TextAnalysis.tokens(lower(col("text"))).as("ts"))
    .select(explode(when(size(col("ts")) >= 3,
      transform(sequence(lit(1), size(col("ts")) - 2),
        i => concat_ws(" ", element_at(col("ts"), i),
          element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
      .otherwise(array())).as("w"))

  private def shingleOcc(dir: String) =
    occOf(Catalog(spark, dir).ref("documents"))

  test("CMS never undercounts: est >= exact for EVERY distinct shingle") {
    val occ = shingleOcc(sf)
    val counters = Sketches.cmsCounters(occ)
    val exact = occ.groupBy("w").agg(count(lit(1)).as("n_exact"))
    val est = Sketches.cmsEstimate(exact, counters).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"undercount for ${r.getAs[String]("w")}")
    }
  }

  test("sketch linearity: counters over a union = summed per-part counters") {
    // This IS the 100 TB claim — the counter table merges by addition,
    // which is exactly what the count aggregate's map-side combine does,
    // so sketching distributes with no custom buffer.
    val occ = shingleOcc(sf)
    val docs = Catalog(spark, sf).ref("documents")
    val a = Sketches.cmsCounters(occOf(docs.filter(col("doc_id") % 2 === 0)))
    val b = Sketches.cmsCounters(occOf(docs.filter(col("doc_id") % 2 === 1)))
    val merged = a.unionByName(b).groupBy("j", "b")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val full = Sketches.cmsCounters(occ)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged === full)
  }

  test("heavy row: topN rows, deterministic order, overestimates visible at scale") {
    val out = Sketches.cmsHeavyAt(spark, sf, topN = 20).collect()
    assert(out.length === 20)
    val exacts = out.map(_.getAs[Long]("n_exact"))
    assert(exacts.zip(exacts.tail).forall { case (x, y) => x >= y })
    out.foreach(r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact")))
  }

  test("HLL: every per-source estimate within 25% of the exact cardinality") {
    // m = 256 → 6.5% standard error; 25% is ~4σ headroom. Every source
    // in the testdata sits above the 5/2·m small-range threshold, so
    // this exercises the raw-estimate regime the operator documents.
    val out = Sketches.hllDistinct(spark, sf).collect()
    assert(out.length > 1)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.25,
        s"${r.getAs[String]("source")}: exact=$exact est=$est")
    }
  }

  test("Bloom screen: no false negatives, per-doc n_bloom >= n_exact") {
    // A shingle present in the train set always probes k set bits, so
    // the Bloom count can only exceed the exact count — never trail it.
    val out = Sketches.bloomContamination(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nb = r.getAs[Long]("n_bloom")
      val ne = r.getAs[Long]("n_exact")
      val ns = r.getAs[Long]("n_shingles")
      assert(nb >= ne, s"false negative on doc ${r.getAs[Long]("doc_id")}")
      assert(nb <= ns)
    }
    // the demonstration the row exists for: false positives are real at
    // the documented load factor, not a degenerate always-exact table
    val fps = out.map(r => r.getAs[Long]("n_bloom") - r.getAs[Long]("n_exact")).sum
    assert(fps > 0, "expected visible false positives at n*k/m ~ 0.5")
  }

  // ---- quantile sketch -------------------------------------------------------

  /** Independent plain-Scala twin of the sketch's canonical closed form:
    * level = min l with ≤ cap rows whose id-hash has ≥ l trailing
    * zeros; sample = those rows; integer rank picks.
    */
  private def qsExpected(dir: String, cap: Int) = {
    val rows = Catalog(spark, dir).ref("events")
      .select(col("event_type"), col("value"), Sketches.qsTz(col("event_id")).as("tz"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    rows.groupBy(_._1).map { case (et, grp) =>
      val n = grp.length.toLong
      val level = Iterator.from(0).find(l => grp.count(_._3 >= l) <= cap).get
      val sample = grp.filter(_._3 >= level).map(_._2).sorted
      def pick(p: Int): Double = {
        val target = (n * p + 99) / 100
        val w = 1L << level
        val i = math.min(math.max((target + w - 1) / w, 1L), sample.length.toLong).toInt
        sample(i - 1)
      }
      et -> ((level.toLong, n, sample.length.toLong, pick(50), pick(95), pick(99)))
    }
  }

  test("quantile sketch: one-pass aggregate equals the canonical closed form") {
    // cap 64 at sf0.001 (~200 rows/group) forces real compactions
    // (level ≥ 1), so this exercises the promote-and-retain path, not
    // the everything-fits case.
    val got = Sketches.quantileSketchAt(spark, sf, cap = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val want = qsExpected(sf, cap = 64)
    assert(got === want)
    assert(got.values.exists(_._1 >= 1), "expected at least one compacted group")
  }

  test("quantile sketch: an all-null group yields NULL estimates, not a crash") {
    import spark.implicits._
    val mixed = Seq(
      ("empty", Option.empty[Double], 1L),
      ("empty", Option.empty[Double], 2L),
      ("full", Some(10.0), 3L),
      ("full", Some(20.0), 4L))
      .toDF("event_type", "value", "event_id")
    val out = Sketches.quantileSketchOf(mixed, cap = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("empty").isNullAt(out("empty").fieldIndex("p50_est")))
    assert(out("empty").getLong(out("empty").fieldIndex("m")) === 0L)
    assert(out("full").getDouble(out("full").fieldIndex("p50_est")) === 10.0)
  }

  test("quantile sketch: canonical under any partitioning / arrival order") {
    // The 100 TB property: partial sketches form per input split and
    // merge in whatever order the combine runs — the result must not
    // depend on either. Hash-survivorship makes the sketch a set
    // function, so every layout below is bit-identical.
    val ev = Catalog(spark, sf).ref("events")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSketchOf(df, cap = 64).collect().toSeq
    val base = run(ev)
    assert(run(ev.repartition(13)) === base)
    assert(run(ev.repartition(1)) === base)
    assert(run(ev.orderBy(col("value").desc)) === base)
    assert(run(ev.orderBy(col("event_id").desc)) === base)
  }

  test("quantile sketch: rank error vs the exact percentile stays bounded") {
    // sf0.01 (~2000 rows/group, cap 1024 → level 1-2, sample ≥ 500):
    // Bernoulli(2^-L) sampling puts the q-quantile's relative rank
    // error near sqrt(q(1-q)/m) ≈ 0.02; 0.08 is ~4σ headroom. The
    // hash is fixed, so this is deterministic, not flaky.
    val dir = "/root/testdata/sf0.01"
    val ests = Sketches.quantileSketch(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(50 -> r.getDouble(4), 95 -> r.getDouble(5),
        99 -> r.getDouble(6))).toMap
    val vals = Catalog(spark, dir).ref("events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((et, picks) <- ests; (p, est) <- picks) {
      val grp = vals(et)
      val rank = grp.count(_ <= est).toDouble / grp.length
      assert(math.abs(rank - p / 100.0) <= 0.08,
        s"$et p$p: est rank $rank vs target ${p / 100.0}")
    }
  }

  test("HLL registers merge by max: split-and-merge equals the union sketch") {
    // The register table's groupBy-max IS the sketch union — the same
    // map-side-combine argument as CMS linearity, pinned explicitly.
    val docs = Catalog(spark, sf).ref("documents")
    def regs(part: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(occOf(part).withColumnRenamed("w", "sh")
        .withColumn("source", lit("all")))
    val a = regs(docs.filter(col("doc_id") % 2 === 0))
    val b = regs(docs.filter(col("doc_id") % 2 === 1))
    val merged = a.unionByName(b).groupBy("source", "j")
      .agg(max("m_j").as("m_j"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val full = regs(docs)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged === full)
    assert(full.nonEmpty)
  }
}
