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
}
