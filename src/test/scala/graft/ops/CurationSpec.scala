package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {

  test("curation pipeline: stages compose losslessly and shards are contiguous") {
    val pos = Curation.curationPositioned(spark, sf).collect()
    assert(pos.nonEmpty, "fixture must survive the full pipeline")
    // survivors are exactly: gopher-passed ∩ train-split ∩ sample draw
    val passed = TextAnalysis.gopherRules(spark, sf).filter(col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = Dedup.leakFreeSplit(spark, sf).filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = pos.map(_.getAs[Long]("doc_id"))
    assert(ids.toSet.subsetOf(passed), "every shipped doc passed gopher rules")
    assert(ids.toSet.subsetOf(train), "every shipped doc is train-split")
    assert(ids.length === ids.toSet.size, "no doc ships twice")
    // positions are a contiguous 1..n permutation; shard ids follow them
    val ps = pos.map(_.getAs[Long]("pos")).sorted
    assert(ps.toSeq === (1L to ps.length).toSeq)
    pos.foreach { r =>
      assert(r.getAs[Long]("shard_id") === (r.getAs[Long]("pos") - 1) / Curation.DocsPerShard)
    }
  }

  test("curation pipeline: manifest matches the written shards") {
    val manifest = Curation.pipelineCurationE2e(spark, sf).collect()
    val total = manifest.map(_.getAs[Long]("n_docs")).sum
    val nPos = Curation.curationPositioned(spark, sf).count()
    assert(total === nPos, "manifest docs must equal pipeline survivors")
    // every shard except the last is exactly DocsPerShard docs
    manifest.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("n_docs") === Curation.DocsPerShard, r.toString)
    }
    manifest.foreach { r =>
      assert(r.getAs[Long]("last_pos") - r.getAs[Long]("first_pos") + 1
        === r.getAs[Long]("n_docs"), "positions within a shard are contiguous")
    }
  }

  test("curation pipeline plan: text is never a shuffle key; tail is one exchange + one broadcast") {
    val df = Curation.curationPositioned(spark, sf)
    df.collect()
    // localCheckpoints segment the composed plan (cluster rounds, the
    // counts pin, the row-number pin); the visible tail is the shard
    // positioning: exactly ONE hash exchange (the __pid numbering join)
    // and ONE broadcast (its offset table). Earlier stages' shapes are
    // pinned by their own operators' plan tests.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange (hash|range)partitioning".r.findAllIn(plan).length === 1,
      s"tail must be a single exchange:\n$plan")
    assert("BroadcastExchange".r.findAllIn(plan).length === 1,
      s"offsets must broadcast:\n$plan")
    assert("partitioning\\((text|chunk|w|text_clean)[,#]".r.findAllIn(plan).isEmpty,
      "document text must never be a shuffle key")
  }

  test("curation pipeline reads documents ONCE: stages consume the shared tokenized cache") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // AQE wraps stages in leaf nodes plain collect() won't descend into
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case q: QueryStageExec => p +: expand(q.plan)
      case _ => p +: p.children.flatMap(expand)
    }
    def docScans(p: SparkPlan): Seq[SparkPlan] = expand(p).filter {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    val sampled = Curation.curationSampled(spark, sf)
    assert(sampled.count() > 0)
    val plan = sampled.queryExecution.executedPlan
    // every stage must read the cached tokenized base, never the parquet
    assert(docScans(plan).isEmpty,
      s"no stage may rescan documents directly:\n$plan")
    val imts = expand(plan).collect { case s: InMemoryTableScanExec => s }
    assert(imts.size >= 2, s"at least the gopher and dedup stages read the cache:\n$plan")
    // ... and all cache reads resolve to ONE relation holding the single scan
    val cachedPlans = imts.map(_.relation.cachedPlan).distinct
    assert(cachedPlans.size === 1, "stages must share one cached base relation")
    assert(docScans(cachedPlans.head).size === 1,
      "the cached base is exactly one documents scan")
  }
}
