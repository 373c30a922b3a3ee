package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every oracle-checkable query from the operator inventory
  * (SURVEY §2) and the training-data-pipeline extensions.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core loop (EP1) run for real: build RECORDs, probe,
    * create job, push every row through the (mock) connector, write the
    * task/log tracking tables, close the job — and return the log
    * relation it produced.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    push.PushQueries.pushE2e(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.TextAnalysis.queries ++ ops.Multimodal.queries ++ ops.AsOf.queries ++
      ops.RangeJoin.queries ++ ops.Graph.queries ++ ops.Search.queries ++
      ops.Curation.queries ++ ops.BpeTrain.queries ++ ops.Cleaning.queries ++
      ops.Dsir.queries ++ ops.Kmeans.queries ++ ops.Sketches.queries ++ ops.Layout.queries ++
      ops.Versioning.queries ++ ops.Pq.queries ++ ops.SkipIndex.queries ++
      ops.LexIndex.queries ++
      ops.Blocklist.queries ++ ops.Subword.queries ++ ops.Augment.queries ++
      ops.Batching.queries ++ ops.Datacard.queries ++
      push.PushQueries.queries ++ streaming.StreamingQueries.queries

  /** DuckDB-runnable oracle SQL twins (same column names — the driver's
    * compare sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Dedup.oracles ++ ops.Similarity.oracles ++
      ops.TextAnalysis.oracles ++ ops.Multimodal.oracles ++ ops.AsOf.oracles ++
      ops.RangeJoin.oracles ++ ops.Graph.oracles ++ ops.Search.oracles ++
      ops.Curation.oracles ++ ops.BpeTrain.oracles ++ ops.Cleaning.oracles ++
      ops.Dsir.oracles ++ ops.Kmeans.oracles ++ ops.Sketches.oracles ++ ops.Layout.oracles ++
      ops.Versioning.oracles ++ ops.Pq.oracles ++ ops.SkipIndex.oracles ++
      ops.LexIndex.oracles ++
      ops.Blocklist.oracles ++ ops.Subword.oracles ++ ops.Augment.oracles ++
      ops.Batching.oracles ++ ops.Datacard.oracles ++
      push.PushQueries.oracles ++ streaming.StreamingQueries.oracles
}
