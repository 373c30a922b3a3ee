package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Ivf

/** Streaming ANN ingest WITH index maintenance — the production loop
  * that keeps a continuously-growing IVF index from rotting: every
  * arriving micro-batch is (1) screened against the CURRENT index
  * (near-dup / retrieval check at ingest, probed-cell partition
  * pruning, O(batch)), (2) appended into its cells (O(Δ), frozen
  * quantizer), and — every `checkEvery`-th applied batch — (3) the
  * k-row drift check runs; when [[Ivf.DriftReport.drifted]] fires, the
  * index is rebalanced in place (bounded-sample retrain + one remap
  * scan + atomic generation commit) and later batches screen against
  * the repaired quantizer.
  *
  * This closes the loop the batch APIs leave open: [[Ivf.appendBatch]]
  * erodes recall under distribution shift, [[Ivf.driftStats]] sees it,
  * [[Ivf.rebalance]] repairs it — here the stream runs all three on an
  * evidence-based trigger instead of a timer. The drift check is the
  * one O(index) step in the loop, so it is AMORTIZED: screen/append
  * run per batch, `driftStats` every `checkEvery`-th applied batch —
  * at 100 TB maintenance cost per batch stays O(Δ + index/checkEvery)
  * instead of growing linearly with index size on every trigger. The
  * cadence counts DURABLE applied tokens, not an in-memory counter,
  * so it survives a restart: after a crash the (N+1)-th applied batch
  * is still the (N+1)-th, wherever N batches landed from.
  *
  * Replay safety: foreachBatch under a streaming checkpoint is
  * at-least-once — after a crash the last uncommitted batch re-runs.
  * Both writes are idempotent per batchId: the screen result lands
  * under a `batch_id=<id>` partition directory in overwrite mode (a
  * replay overwrites its own output, never duplicates it), and the
  * index append goes through [[Ivf.appendBatchIdempotent]], whose
  * data + token commit is ONE atomic segment rename — a crash at any
  * point either replays a never-committed stage (applies once) or
  * finds the committed token (no-ops), so no replay can duplicate
  * vectors or self-match pollute the sink.
  */
object IvfIngest {

  /** One row of maintenance telemetry per micro-batch. `checked` marks
    * the batches whose drift scan actually ran (the `checkEvery`
    * cadence); on unchecked batches `meanCos` is NaN and
    * `drifted`/`rebalanced` are false. `replayed` marks batches whose
    * append was skipped because the token was already applied — their
    * `screenedPairs`/`appended` are UNKNOWN (reported as -1, not 0):
    * the original run's counts are not recoverable, though its sink
    * partition holds the real rows.
    */
  final case class BatchReport(batchId: Long, screenedPairs: Long,
      appended: Long, meanCos: Double, checked: Boolean, drifted: Boolean,
      rebalanced: Boolean, replayed: Boolean)

  /** Drain `srcDir` (a staged file-stream directory, one file per
    * trigger) through the screen→append→maintain loop against the
    * index at `index0`. Screening output accumulates under
    * `sinkDir/batch_id=<id>/`; returns the per-batch maintenance
    * telemetry.
    */
  def ingestStream(spark: SparkSession, srcDir: String, index0: Ivf.IvfIndex,
      k: Int, nprobe: Int, sinkDir: String, checkEvery: Int = 4,
      compactEvery: Int = 0,
      mergePolicy: Option[graft.ops.MergePolicy] = None): Seq[BatchReport] = {
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    val schema = spark.read.parquet(srcDir).schema
    // foreachBatch closes over the MUTABLE index handle: a rebalance
    // commits a new generation and later batches pick up the new
    // quantizer through this reference
    var index = index0
    val reports = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val token = s"ingest:$id"
        // ONE durable token read per batch: replay detection and both
        // maintenance cadences share it (appliedTokens lists segment
        // directories — reading it thrice per trigger tripled that IO).
        val applied0 = Ivf.appliedTokens(index)
        // Replay detection FIRST: if the token is already applied, the
        // batch's vectors are inside the index — re-screening would let
        // every delta vector match ITSELF at rank 1 and overwrite the
        // original (correct) sink partition with self-polluted rows.
        // The original output is already on disk; skip everything.
        if (applied0.contains(token)) {
          reports += BatchReport(id, -1L, -1L, Double.NaN,
            checked = false, drifted = false, rebalanced = false,
            replayed = true)
        } else {
          val pinned = batch.localCheckpoint()
          // pin the screen result so the write and the telemetry count
          // share one computation
          val screened = Ivf.screenBatch(spark, index, pinned, k, nprobe)
            .localCheckpoint()
          // overwrite INTO the batch's own partition dir: replay-idempotent
          screened.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$id")
          val fresh = Ivf.appendBatchIdempotent(index, pinned, token = token)
          // Durable cadence over THIS STREAM's tokens only (the
          // `ingest:` prefix): batch appends or other producers landing
          // tokens on the same index must not skip or double-fire the
          // maintenance schedule. Restart-proof: the count lives in the
          // index, not in memory.
          val streamApplied = applied0.count(_.startsWith("ingest:")) +
            (if (fresh) 1 else 0)
          val check = fresh && streamApplied % checkEvery == 0
          val dr = if (check) Some(Ivf.driftStats(spark, index)) else None
          val fire = dr.exists(_.drifted())
          if (fire) index = Ivf.rebalance(spark, index)
          // segment hygiene on the same durable cadence: every
          // compactEvery-th applied batch re-lands the accrued append
          // segments as one file set per cell, so per-cell file opens
          // stay bounded however long the stream runs. A rebalance
          // already re-lands everything — skip compaction on its batch.
          // maintenance only on a FRESH batch: a replayed token landed
          // no rows, so re-firing compaction (a full rewrite!) or even
          // a merge's lease + segment-size walk charges real IO to a
          // batch that changed nothing
          else if (fresh && compactEvery > 0 && streamApplied % compactEvery == 0)
            index = Ivf.compactIndex(spark, index)
          // size-tiered alternative to the full rewrite: self-pacing
          // (no-ops until a tier fills), so it runs after EVERY applied
          // batch — total bytes rewritten stay O(N log B) over a
          // B-batch stream instead of compactEvery's (B/c)·N
          else if (fresh)
            mergePolicy.foreach(p => Ivf.mergeSegments(spark, index, p))
          reports += BatchReport(id, screened.count(), pinned.count(),
            dr.map(_.meanCosNow).getOrElse(Double.NaN),
            checked = check, drifted = fire, rebalanced = fire,
            replayed = false)
        }
        ()
      }
      .option("checkpointLocation", s"$sinkDir.ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    reports.toSeq
  }
}
