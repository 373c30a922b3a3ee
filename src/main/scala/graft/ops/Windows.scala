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
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
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
}
