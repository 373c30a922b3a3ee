package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Ivf

/** Streaming ANN ingest WITH index maintenance — the production loop
  * that keeps a continuously-growing IVF index from rotting: every
  * arriving micro-batch is (1) screened against the CURRENT index
  * (near-dup / retrieval check at ingest, probed-cell partition
  * pruning, O(batch)), (2) appended into its cells (O(Δ), frozen
  * quantizer), and (3) followed by the k-row drift check; when
  * [[Ivf.DriftReport.drifted]] fires, the index is rebalanced in place
  * (bounded-sample retrain + one remap scan + atomic swap) and later
  * batches screen against the repaired quantizer.
  *
  * This closes the loop the batch APIs leave open: [[Ivf.appendBatch]]
  * erodes recall under distribution shift, [[Ivf.driftStats]] sees it,
  * [[Ivf.rebalance]] repairs it — here the stream runs all three on an
  * evidence-based trigger instead of a timer. At 100 TB the same loop
  * runs with the screen/append per batch and driftStats amortized
  * (every Nth batch): the report row is bounded metadata either way.
  */
object IvfIngest {

  /** One row of maintenance telemetry per micro-batch. */
  final case class BatchReport(batchId: Long, screenedPairs: Long,
      appended: Long, meanCos: Double, drifted: Boolean, rebalanced: Boolean)

  /** Drain `srcDir` (a staged file-stream directory, one file per
    * trigger) through the screen→append→maintain loop against the
    * index at `index0`. Screening output accumulates under `sinkDir`;
    * returns the per-batch maintenance telemetry.
    */
  def ingestStream(spark: SparkSession, srcDir: String, index0: Ivf.IvfIndex,
      k: Int, nprobe: Int, sinkDir: String): Seq[BatchReport] = {
    val schema = spark.read.parquet(srcDir).schema
    // foreachBatch closes over the MUTABLE index handle: a rebalance
    // swaps the directory atomically and later batches pick up the new
    // quantizer through this reference
    var index = index0
    val reports = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val pinned = batch.localCheckpoint()
        // pin the screen result so the write and the telemetry count
        // share one computation
        val screened = Ivf.screenBatch(spark, index, pinned, k, nprobe)
          .localCheckpoint()
        screened.write.mode("append").parquet(sinkDir)
        Ivf.appendBatch(index, pinned)
        val dr = Ivf.driftStats(spark, index)
        val fire = dr.drifted()
        if (fire) index = Ivf.rebalance(spark, index)
        reports += BatchReport(id, screened.count(), pinned.count(),
          dr.meanCosNow, fire, fire)
        ()
      }
      .option("checkpointLocation", s"$sinkDir.ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    reports.toSeq
  }
}
