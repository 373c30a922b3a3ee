package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkTestBase {

  test("corpusDiff: every diff class fires and the counts partition both versions") {
    val rows = Versioning.corpusDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    def tot(c: String): Long = rows.map(_.getAs[Long](c)).sum
    val (added, removed, changed, unchanged) =
      (tot("n_added"), tot("n_removed"), tot("n_changed"), tot("n_unchanged"))
    assert(added > 0 && removed > 0 && changed > 0 && unchanged > 0,
      s"vacuous fixture: $added/$removed/$changed/$unchanged")
    // v1 docs are exactly removed + changed + unchanged; added is v2-only
    val docs = graft.catalog.Catalog(spark, sf).ref("documents")
    val n = docs.count()
    assert(removed + changed + unchanged == n)
    // replay the derivation draws independently
    def drawCount(salt: String, m: Long): Long = docs.filter(
      graft.functions.ArrayExprs.md5Mod(
        concat(lit(salt + ":"), col("doc_id").cast("string")), m) === 0).count()
    assert(added == drawCount("vadd", 25L))
    val dropped = drawCount("vdrop", 20L)
    assert(removed == dropped)
    // changed = revised minus those that were also dropped
    val revisedSurviving = docs.filter(
      graft.functions.ArrayExprs.md5Mod(
        concat(lit("vmod:"), col("doc_id").cast("string")), 10L) === 0 &&
      graft.functions.ArrayExprs.md5Mod(
        concat(lit("vdrop:"), col("doc_id").cast("string")), 20L) =!= 0).count()
    assert(changed == revisedSurviving)
  }

  test("corpusDiff: the diff join moves hashes, not text, and aggregates partially") {
    val plan = Versioning.corpusDiff(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected a full-outer equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"diff must stay an equi-join:\n$plan")
    assert(plan.contains("partial_"), s"per-source rollup must partial-aggregate:\n$plan")
    // text is consumed by md5() inside the scan-side projection; no
    // exchange carries the text attribute
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text#")),
      s"text must not cross a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("manifest diff equals the rescan diff; the old corpus is read as manifest only") {
    import org.apache.spark.sql.functions._
    val rescan = Versioning.corpusDiff(spark, sf).collect().map(_.toString)
    val incremental = Versioning.corpusDiffIncremental(spark, sf)
      .collect().map(_.toString)
    assert(incremental.nonEmpty)
    assert(incremental.toSeq === rescan.toSeq)
    // reusable manifest: two diffs against ONE persisted manifest, and
    // the diff plan's v1 side reads the manifest parquet, not documents
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val mdir = tmpDir("manifest_reuse")
    Versioning.writeManifest(docs, s"$mdir/v1")
    val fps = docs.select(col("doc_id"), col("source").as("s2"),
      md5(col("text")).as("h2"))
    val d1 = Versioning.diffAgainstManifest(spark, s"$mdir/v1", fps)
    val selfDiff = d1.collect()
    // identical corpora: everything unchanged
    selfDiff.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.getLong(4) > 0L)
    }
    val manifestInputs = d1.inputFiles.filter(_.contains("manifest_reuse"))
    assert(manifestInputs.nonEmpty, "the v1 side must read the manifest")
  }
}
