package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LexIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("persisted BM25 reproduces the in-memory ranking exactly") {
    val got = LexIndex.bm25Persisted(spark, sf).collect().map(_.toString).sorted
    val want = Search.textBm25(spark, sf).collect().map(_.toString).sorted
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "postings-on-disk scoring must be bit-identical to the corpus-scan path")
  }

  test("query-time reads are O(query terms): only the terms' tb buckets are planned, with the term filter pushed") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(pl: SparkPlan): Seq[SparkPlan] = pl match {
      case a: AdaptiveSparkPlanExec => pl +: expand(a.executedPlan)
      case q: QueryStageExec => pl +: expand(q.plan)
      case _ => pl +: pl.children.flatMap(expand)
    }
    val docs = (0 until 2000).map(i =>
      (i.toLong, s"alpha bravo tok$i charlie ${if (i % 3 == 0) "delta" else "echo"}"))
      .toDF("doc_id", "text")
    val path = tmpDir("lex_prune") + "/index"
    LexIndex.buildIndex(docs, path)
    val qs = Seq("qa" -> "delta", "qa" -> "alpha")
    val res = LexIndex.bm25TopK(spark, path, qs, 5)
    assert(res.count() === 5)
    val buckets = LexIndex.bucketsOf(spark, Seq("delta", "alpha"))
    // with a vocabulary >> 64 buckets, every bucket holds postings: the
    // full index spans all 64 partitions, the query plans <= |terms|.
    // The postings fetch is the query's ONLY corpus-touching read
    // (bm25TopK pins it with a localCheckpoint), so its executed scan
    // carries the whole O(query-terms) claim.
    val all = LexIndex.indexData(spark, path)
    assert(all.select("tb").distinct().count() === 64L, "fixture must fill all buckets")
    val totalFiles = all.inputFiles.length
    val pruned = all.filter(col("tb").isin(buckets: _*))
      .filter(col("term").isin("delta", "alpha"))
    assert(pruned.count() > 0)
    val scans = expand(pruned.queryExecution.executedPlan).collect {
      case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains("lex_prune")) => sc
    }
    assert(scans.nonEmpty, "postings scan missing from plan")
    assert(scans.head.partitionFilters.exists(_.toString.contains("tb")),
      "tb buckets must prune as partition filters")
    assert(scans.head.metadata.get("PushedFilters").exists(_.contains("term")),
      s"term equality must push to the scan: ${scans.head.metadata.get("PushedFilters")}")
    assert(scans.head.metrics("numPartitions").value <= buckets.size.toLong,
      "partitions read must be bounded by the query's bucket count")
    assert(scans.head.metrics("numFiles").value < totalFiles.toLong / 8L,
      s"bucket pruning must skip most postings files: ${scans.head.metrics("numFiles").value}/$totalFiles")
  }

  test("idempotent append: postings and corpus stats land atomically; df/n_docs/sum_dl stay exact; replay no-ops") {
    val d1 = (0 until 100).map(i => (i.toLong, s"alpha common$i beta")).toDF("doc_id", "text")
    val d2 = (100 until 150).map(i => (i.toLong, s"alpha gamma$i")).toDF("doc_id", "text")
    val path = tmpDir("lex_append") + "/index"
    LexIndex.buildIndex(d1, path)
    val s1 = LexIndex.readStats(path)
    assert(s1 === LexIndex.LexStats(100L, 300L))
    assert(LexIndex.appendDocsIdempotent(path, d2, "batch:1"))
    val s2 = LexIndex.readStats(path)
    assert(s2 === LexIndex.LexStats(150L, 400L),
      "per-segment stats sidecars must sum to the union corpus")
    // replay no-ops — neither postings nor stats double-count
    assert(!LexIndex.appendDocsIdempotent(path, d2, "batch:1"))
    assert(LexIndex.readStats(path) === s2)
    // the appended docs are queryable and df reflects the union: 'alpha'
    // appears in all 150 docs, so its rational idf is minimal but its
    // postings span both segments
    val res = LexIndex.bm25TopK(spark, path, Seq("q" -> "alpha"), 150)
    assert(res.count() === 150L, "query must see base and appended postings")
    // the in-memory scorer over the union corpus agrees exactly
    val want = Search.topK(
      {
        val docs = d1.unionByName(d2)
        val tok = docs.select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("t"))
        val tf = tok.select(col("doc_id"), size(col("t")).cast("long").as("dl"),
          explode(col("t")).as("term"))
          .filter(col("term") === "alpha")
          .groupBy(col("doc_id"), col("term"), col("dl"))
          .agg(count(lit(1)).as("tf"))
        tf.join(broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("df"))), Seq("term"))
          .join(broadcast(Seq(("q", "alpha")).toDF("query_id", "term")), Seq("term"))
          .withColumn("n_docs", lit(150L)).withColumn("sum_dl", lit(400L))
      }, Search.rationalIdf, 150).collect().map(_.toString).sorted
    assert(res.collect().map(_.toString).sorted.toSeq === want.toSeq)
  }

  test("hybrid RRF: lexical and PRF-semantic lists fuse; doc in both lists outranks single-list docs at equal ranks") {
    val out = LexIndex.hybridRrf(spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getString(0))
    assert(byQ.keySet === Set("q1", "q2", "q3"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // RRF scores are bounded by the two lists' 1/(60+r) contributions
      assert(scores.head <= 1.0 / 61 + 1.0 / 61 + 1e-12)
      assert(scores.last > 0.0)
    }
    // a doc appearing in BOTH lists at rank r beats a doc in ONE list at
    // rank r — the defining fusion property: max single-list score
    // (1/61) < min two-list score (2/70) at the fused depths here
    val twoList = out.filter(_.getDouble(3) > 1.0 / 61)
    assert(twoList.nonEmpty, "the fixture must produce at least one doc in both lists")
  }
}
