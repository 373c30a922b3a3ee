package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.ops.LexIndex

/** Streaming CDC maintenance of the persisted BM25 postings index —
  * [[CdcIngest]]'s loop on the lexical side, completing the pattern for
  * every index family: a live document feed (crawl output, re-crawls,
  * takedowns) keeps the serving index current without rebuilds. Every
  * micro-batch carries `(doc_id, text, op)` rows and applies as ONE
  * atomic token-guarded mutation ([[LexIndex.applyCdcDocs]]): postings,
  * doc-dir and stats sidecar commit together, deletes adjust the
  * scoring constants through the doc-dir sidecars (O(takedown list),
  * never a postings scan), and a replayed batch — including its
  * deletes — is a structural no-op on the durable token.
  *
  * The lexical index has no drift concept (stats are exact, not a
  * trained quantizer), so the only amortized maintenance is segment
  * hygiene: every `compactEvery`-th applied batch re-lands the accrued
  * segments as one, bounding per-bucket file counts however long the
  * stream runs — an append touches up to 64 `tb` partitions, so file
  * growth is steepest here of all the families.
  */
object DocIngest {

  /** Telemetry per micro-batch; op counts are -1 on `replayed` batches
    * (the original run's counts are not recoverable from the committed
    * segment alone). `maintBytes` is what this batch's maintenance step
    * physically rewrote (the full generation for a compaction, the
    * merged group's input bytes for a tiered merge, 0 when maintenance
    * did not fire) — the [[CdcIngest.BatchReport]] dial, mirrored here
    * because the postings family has the steepest file growth of all
    * four and so the strongest case for watching its rewrite curve.
    */
  final case class BatchReport(batchId: Long, inserted: Long, upserted: Long,
      deleted: Long, compacted: Boolean, replayed: Boolean,
      maintBytes: Long = 0L)

  /** Drain `srcDir` (a staged file-stream directory of op-tagged doc
    * batches, one file per trigger) through the CDC-apply loop against
    * the lexical index at `path`. Returns the per-batch telemetry.
    */
  def ingestStreamDocs(spark: SparkSession, srcDir: String, path: String,
      compactEvery: Int = 0, checkpointDir: String = "",
      mergePolicy: Option[graft.ops.MergePolicy] = None): Seq[BatchReport] = {
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    val ckpt = if (checkpointDir.nonEmpty) checkpointDir else s"$srcDir.ckpt"
    val schema = spark.read.parquet(srcDir).schema
    val reports = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val token = s"docs:$id"
        val applied0 = graft.util.IndexMaint.appliedTokens(
          graft.util.IndexMaint.liveGen(path))
        if (applied0.contains(token)) {
          reports += BatchReport(id, -1L, -1L, -1L,
            compacted = false, replayed = true)
        } else {
          val pinned = batch.localCheckpoint()
          val byOp = pinned.groupBy(col("op")).count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val fresh = LexIndex.applyCdcDocs(path, pinned, token)
          val streamApplied = applied0.count(_.startsWith("docs:")) +
            (if (fresh) 1 else 0)
          val compact = fresh && compactEvery > 0 &&
            streamApplied % compactEvery == 0
          var maintBytes = 0L
          if (compact) {
            LexIndex.compactIndex(spark, path)
            maintBytes = graft.util.Fs.treeBytes(
              graft.util.IndexMaint.liveGen(path))
          }
          // size-tiered alternative to the full rewrite
          // ([[IvfIngest]] rationale) — matters most on this family:
          // an append touches up to 64 tb partitions per batch. Merge-
          // scoped tombstone reclamation rides along, so a mutation-
          // heavy doc stream (re-crawls, takedowns) reclaims pairs as
          // it merges instead of deferring them to a full compact.
          else if (fresh)
            mergePolicy.foreach(p => LexIndex.mergeSegments(spark, path, p)
              .foreach(r => maintBytes = r.bytesIn))
          reports += BatchReport(id,
            byOp.getOrElse("insert", 0L), byOp.getOrElse("upsert", 0L),
            byOp.getOrElse("delete", 0L), compacted = compact,
            replayed = false, maintBytes = maintBytes)
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    reports.toSeq
  }
}
