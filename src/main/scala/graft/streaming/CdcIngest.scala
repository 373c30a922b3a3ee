package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Ivf

/** Streaming CDC maintenance of a persisted IVF index — the reference's
  * `load_type` surface (delete / hardDelete / insert / update / upsert,
  * README.md:68) as a live index pipeline: every arriving micro-batch
  * carries op-tagged rows and applies as ONE atomic, token-guarded
  * mutation ([[Ivf.applyCdcIdempotent]]), so the index tracks a mutating
  * upstream corpus — new docs, re-embedded docs, takedowns — without
  * rebuilds and without ever serving a half-applied batch.
  *
  * Same replay story as [[IvfIngest]]: foreachBatch under a streaming
  * checkpoint is at-least-once, and the applied-token check runs FIRST,
  * so a replayed batch is a structural no-op — critically including its
  * deletes, which must NOT re-tombstone ids a later batch legitimately
  * re-inserted (that is why a pure-delete batch still commits a durable
  * zero-row segment). Maintenance is amortized on the same durable
  * cadence as [[IvfIngest]], counting only this stream's `cdc:` tokens:
  * every `checkEvery`-th applied batch runs the k-row drift check and
  * rebalances on evidence (which also physically reclaims accumulated
  * tombstones); every `compactEvery`-th re-lands segments to bound
  * per-cell file counts however long the stream runs — or, the shape a
  * LONG-LIVED CDC stream should run, `mergePolicy` replaces the
  * periodic full rewrite with the size-tiered merge
  * ([[graft.ops.MergePolicy]] / `Ivf.mergeSegments`): O(N log B) total
  * bytes rewritten over B batches instead of (B/c)·N, with each merge
  * physically reclaiming the merged segments' own tombstone pairs —
  * the reclamation a mutation-heavy stream otherwise defers to a full
  * compact.
  */
object CdcIngest {

  /** One row of telemetry per micro-batch. On `replayed` batches the
    * op counts are UNKNOWN (reported as -1, not 0): the original run's
    * counts are not recoverable from the committed segment alone.
    * `maintBytes` is what this batch's maintenance step physically
    * rewrote (full generation bytes for a rebalance/compaction, the
    * merged group's input bytes for a tiered merge, 0 when maintenance
    * did not fire) — the dial an operator watches to see whether the
    * stream's write amplification is bounded.
    */
  final case class BatchReport(batchId: Long, inserted: Long, upserted: Long,
      deleted: Long, checked: Boolean, drifted: Boolean, rebalanced: Boolean,
      replayed: Boolean, maintBytes: Long = 0L)

  /** Drain `srcDir` (a staged file-stream directory of op-tagged
    * `(vec_id, embedding, op)` batches, one file per trigger) through
    * the CDC-apply→maintain loop against the index at `index0`.
    * Returns the per-batch telemetry.
    */
  def ingestStreamCdc(spark: SparkSession, srcDir: String, index0: Ivf.IvfIndex,
      checkEvery: Int = 4, compactEvery: Int = 0,
      checkpointDir: String = "",
      mergePolicy: Option[graft.ops.MergePolicy] = None): Seq[BatchReport] = {
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    val ckpt = if (checkpointDir.nonEmpty) checkpointDir else s"$srcDir.ckpt"
    val schema = spark.read.parquet(srcDir).schema
    // the mutable handle: a rebalance commits a new generation and later
    // batches pick up the repaired quantizer through this reference
    var index = index0
    val reports = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val token = s"cdc:$id"
        // one durable token read per batch, shared by replay detection
        // and both maintenance cadences
        val applied0 = Ivf.appliedTokens(index)
        if (applied0.contains(token)) {
          reports += BatchReport(id, -1L, -1L, -1L, checked = false,
            drifted = false, rebalanced = false, replayed = true)
        } else {
          val pinned = batch.localCheckpoint()
          val byOp = pinned.groupBy(col("op")).count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val fresh = Ivf.applyCdcIdempotent(index, pinned, token)
          val streamApplied = applied0.count(_.startsWith("cdc:")) +
            (if (fresh) 1 else 0)
          val check = fresh && streamApplied % checkEvery == 0
          val dr = if (check) Some(Ivf.driftStats(spark, index)) else None
          val fire = dr.exists(_.drifted())
          var maintBytes = 0L
          if (fire) {
            index = Ivf.rebalance(spark, index)
            maintBytes = graft.util.Fs.treeBytes(
              graft.util.IndexMaint.liveGen(index.path))
          }
          // maintenance only on a FRESH batch (the [[IvfIngest]]
          // invariant): a replayed/concurrently-applied token landed no
          // rows here, so firing compaction — a full rewrite — would
          // charge real IO to a batch that changed nothing. Reachable
          // when a concurrent drain applies the token between the
          // applied0 read and the apply.
          else if (fresh && compactEvery > 0 && streamApplied % compactEvery == 0) {
            index = Ivf.compactIndex(spark, index)
            maintBytes = graft.util.Fs.treeBytes(
              graft.util.IndexMaint.liveGen(index.path))
          }
          // size-tiered alternative to the full rewrite ([[IvfIngest]]
          // rationale): self-pacing (no-ops until a tier fills), so it
          // runs after EVERY applied batch — this is the maintenance
          // plan a long-lived CDC stream runs, where compactEvery's
          // (B/c)·N rewrite bytes are the scale hazard. Merge-scoped
          // tombstone reclamation rides along: each merged segment
          // re-lands minus its own tombstone pairs, so a
          // tombstone-heavy stream (deletes/upserts) reclaims as it
          // merges instead of accruing pairs until a full compact.
          else if (fresh)
            mergePolicy.foreach(p => Ivf.mergeSegments(spark, index, p)
              .foreach(r => maintBytes = r.bytesIn))
          reports += BatchReport(id,
            byOp.getOrElse("insert", 0L), byOp.getOrElse("upsert", 0L),
            byOp.getOrElse("delete", 0L), checked = check, drifted = fire,
            rebalanced = fire, replayed = false, maintBytes = maintBytes)
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
