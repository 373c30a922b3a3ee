package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BatchingSpec extends SparkTestBase {

  test("length batching: batches are length-contiguous, sized B, waste beats random batching") {
    val out = Batching.lengthBatching(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getLong(1)).sum === nDocs)
    // all full batches except possibly the last
    val sizes = out.map(_.getLong(1))
    assert(sizes.init.forall(_ === Batching.BatchSize.toLong))
    // length-sorted: max_tokens non-increasing across batch ids
    val maxes = out.map(_.getLong(2))
    assert(maxes.zip(maxes.tail).forall { case (a, b) => a >= b })
    // padding economics: sorted batching must beat the doc-order plan
    val sortedWaste = out.map(_.getLong(4)).sum
    val byDocOrder = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id")
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    val randWaste = byDocOrder.grouped(Batching.BatchSize)
      .map(g => g.length * g.max - g.sum).sum
    assert(sortedWaste <= randWaste,
      s"sorted batching waste $sortedWaste must not exceed doc-order waste $randWaste")
    // per-batch identity: waste = n*max - sum
    out.foreach { r =>
      assert(r.getLong(4) === r.getLong(1) * r.getLong(2) - r.getLong(3))
      assert(r.getLong(4) >= 0)
    }
  }

  test("chunking: spans tile each document with the configured overlap, no token dropped") {
    val out = Batching.chunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val step = Batching.ChunkLen - Batching.ChunkOverlap
    out.groupBy(_._1).foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // indices contiguous from 0; starts advance by step
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx === i.toLong)
        assert(start === i.toLong * step)
        assert(len >= 1 && len <= Batching.ChunkLen)
      }
      // coverage: last chunk reaches the end of the document
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen === toks(doc),
        s"doc $doc: chunks end at ${lastStart + lastLen} of ${toks(doc)} tokens")
      // short docs are exactly one chunk
      if (toks(doc) <= Batching.ChunkLen) assert(sorted.length === 1)
    }
  }

  test("batching plan avoids a single-partition window; chunking is scan work") {
    val lb = Batching.lengthBatching(spark, sf).queryExecution.executedPlan.toString
    assert(lb.contains("__pid"), s"global numbering must use the two-pass helper:\n$lb")
    val badWindow = lb.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition"))
    assert(!badWindow, s"no single-partition window allowed:\n$lb")
    val co = Batching.chunkOverlap(spark, sf).queryExecution.executedPlan.toString
    assert(!co.contains("Exchange hashpartitioning"), s"chunk planning must not shuffle:\n$co")
  }
}
