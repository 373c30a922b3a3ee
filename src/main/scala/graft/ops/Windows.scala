package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering.
  *
  * The reference numbers whole relations with `row_number() over
  * (partition by null order by null)`
  * (`macros/apps/operations/marketing_cloud_data_extension_upload.sql:56`).
  * The literal Spark translation is an unpartitioned window, which moves
  * every row to ONE partition — correct, but a scale killer (WindowExec
  * logs "No Partition Defined" and single-threads the whole relation).
  *
  * This helper produces the identical numbering with a two-pass plan that
  * stays parallel at any scale:
  *   1. range-repartition on the order key (so partition p holds keys
  *      strictly below partition p+1) and number rows *within* each
  *      partition — parallel window, no data motion beyond the range
  *      shuffle;
  *   2. compute per-partition row counts (a |partitions|-row aggregate),
  *      turn them into cumulative offsets on the driver, and add the
  *      offset back via a broadcast join on partition id.
  *
  * Requires a total order: `orderCols` must be duplicate-free across rows
  * (range partitioning may split ties across partitions, which would make
  * tie numbering nondeterministic).
  */
object Windows {

  /** Append a 1-based global `rnName` column ordered by `orderCols`. */
  def globalRowNumber(df: DataFrame, rnName: String, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint pins ONE evaluation of the range shuffle: the counts
    // pass and the numbering pass below both read the materialized
    // partitions, so a nondeterministic upstream (unordered shuffle
    // output changing the range-bound sample) cannot give the two
    // branches different __pid assignments. Lazy — materialized by the
    // counts collect, reused by the join.
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val local = parted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*)))
    // Pass 1: per-partition counts → cumulative offsets (driver-side;
    // |partitions| rows, never the data).
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rnName, (col("__lrn") + col("__off")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }

  /** [[groupedRunningSum]] when the caller can name a DETERMINISTIC
    * bucket expression that is monotone non-decreasing in the order
    * column within every group (e.g. `doc_id * P / N` over dense ids):
    * same two-pass running sum and the same dominant-group de-skew, but
    *
    *   - no range-partitioner SAMPLING job (the bucket is computed, not
    *     estimated from the data),
    *   - no `spark_partition_id` identity and therefore no
    *     localCheckpoint pin: the bucket is a pure row function, so the
    *     local-sum and offset subtrees agree by construction under any
    *     re-execution, and Catalyst shares the one hash exchange.
    *
    * Pass `buckets` ≈ the parallelism you want the largest group spread
    * over. Monotonicity is the caller's contract: if a group's rows in
    * `orderCol` order ever moved to a SMALLER bucket, offsets would
    * double-count (the fixture's dense ids make `id * P / N` safe).
    */
  def bucketedRunningSum(df: DataFrame, sumName: String, groupCol: Column,
                         valueCol: Column, orderCol: Column,
                         bucketExpr: Column): DataFrame = {
    val bucketed = df.withColumn("__b", bucketExpr)
    val localW = Window.partitionBy(groupCol, col("__b")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__lsum", sum(valueCol).over(localW))
    val offW = Window.partitionBy(col("__g")).orderBy(col("__ob"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Per-(group, bucket) totals read off the WINDOWED relation (the
    // last running value of each cell), not a second aggregate over the
    // input: both subtrees then share the scan→exchange prefix verbatim,
    // so ReusedExchange evaluates the upstream once — the same effect
    // groupedRunningSum buys with its localCheckpoint pin, for free.
    val offsets = local
      .groupBy(groupCol.as("__g"), col("__b").as("__ob"))
      .agg(max_by(col("__lsum"), orderCol).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select(col("__g"), col("__ob"), col("__off"))
    // <=> on BOTH keys: a plain === would push an isnotnull(__b) filter
    // into the probe subtree only, making it structurally different from
    // the offsets subtree and silently defeating the exchange reuse this
    // whole shape exists for (verified via executedPlan: one exchange,
    // reused, vs two full scans with ===).
    local.join(broadcast(offsets),
        groupCol <=> col("__g") && col("__b") <=> col("__ob"))
      .withColumn(sumName, col("__lsum") + col("__off"))
      .drop("__g", "__ob", "__b", "__lsum", "__off")
  }

  /** Append `sumName` = per-group running sum of `valueCol` (inclusive of
    * the current row), ordered by `orderCols` within `groupCol` — the
    * exact semantics of `sum(value) over (partition by group order by ord
    * rows unbounded preceding)` — WITHOUT ever giving a whole group to
    * one task.
    *
    * `Window.partitionBy(group)` running sums are the classic skew trap:
    * a 90%-English corpus runs its dominant group in ONE task no matter
    * how many executors exist. This helper keeps the same two-pass shape
    * as [[globalRowNumber]], generalized to grouped sums:
    *   1. range-repartition on (group, orderCols) — a big group spans
    *      many partitions, each holding a contiguous order-range of it —
    *      and running-sum *within* (group, partition): parallel window,
    *      bounded partitions.
    *   2. per-(group, partition) totals (≤ |partitions| + |groups| rows —
    *      metadata, not data) get a cumulative-offset window keyed by
    *      partition id, and broadcast-join back.
    *
    * Requires (groupCol, orderCols) duplicate-free across rows — range
    * partitioning may split ties, which would make tie sums
    * nondeterministic (same contract as [[globalRowNumber]]).
    */
  def groupedRunningSum(df: DataFrame, sumName: String, groupCol: Column,
                        valueCol: Column, orderCols: Column*): DataFrame = {
    // Same single-evaluation pin as globalRowNumber: the local-sum and
    // offset subtrees must see identical __pid assignments even with
    // exchange reuse disabled and a nondeterministic upstream.
    val parted = df.repartitionByRange((groupCol +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val localW = Window.partitionBy(groupCol, col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__lsum", sum(valueCol).over(localW))
    // Totals per (group, partition): tiny, so the offset window's
    // per-group partitioning is harmless here (it sees row counts in the
    // tens, never the data).
    val offW = Window.partitionBy(col("__g")).orderBy(col("__opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted
      .groupBy(groupCol.as("__g"), col("__pid").as("__opid"))
      .agg(sum(valueCol).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select(col("__g"), col("__opid"), col("__off"))
    local.join(broadcast(offsets),
        groupCol <=> col("__g") && col("__pid") === col("__opid"))
      .withColumn(sumName, col("__lsum") + col("__off"))
      .drop("__g", "__opid", "__pid", "__lsum", "__off")
  }
}
