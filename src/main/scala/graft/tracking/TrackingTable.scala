package graft.tracking

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-agnostic tracking-table contract shared by the flat and the
  * partitioned implementations — the seam the push pipelines write
  * through (and where Delta/Iceberg MERGE would slot in).
  */
trait TrackingStore {
  def read(): DataFrame
  def upsert(incoming: DataFrame): Unit
  def append(incoming: DataFrame): Unit
  def fullRefresh(): Unit

  /** Small-file compaction. Append-heavy stores accumulate one file set
    * per run forever; periodic compaction keeps scan/list cost bounded.
    * Data-identical rewrite; layout-specific file targeting below.
    */
  def compact(): Unit
}

/** The reference's `tracking_table` materialization (M2,
  * `macros/tracking_table_materialization.sql:1-53`): an incremental
  * upsert table keyed by `uniqueKey`, immune to normal full-refresh,
  * rebuilt only on explicit request (`drop-omnata-task-tables` var), with
  * column-type widening before each upsert
  * (`adapter.expand_target_column_types`, `:31-33`).
  *
  * Storage is plain Parquet under `path`. Updates rewrite via a temp dir +
  * atomic rename — the Spark/Parquet analogue of the reference's
  * backup-rename dance (`:19-27`), since Parquet has no in-place update.
  * On a real deployment this class is the seam where Delta/Iceberg MERGE
  * slots in; the public API (`createIfMissing / upsert / updateJoin /
  * fullRefresh`) is storage-agnostic.
  *
  * Scale: upsert = `existing LEFT ANTI incoming UNION incoming` — one
  * shuffle on the key; with the table partitioned by a key prefix only
  * touched partitions need rewriting (v2: partition-pruned rewrite).
  */
final class TrackingTable(
    spark: SparkSession,
    val path: String,
    val schema: StructType,
    val uniqueKey: String) extends TrackingStore {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dataPath = new Path(path, "data")

  def exists: Boolean = fs.exists(dataPath)

  /** Ref `:17-18`: first run creates the (empty-schema) table. A crash
    * between a previous swap's two renames leaves the live dir absent but
    * the backup present — restore it FIRST, or `exists` would be false and
    * a fresh empty table would shadow (and permanently strand) the backup.
    */
  def createIfMissing(): Unit = {
    graft.util.AtomicSwap.recover(fs, dataPath)
    if (!exists) {
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      empty.write.mode("overwrite").parquet(dataPath.toString)
    }
  }

  def read(): DataFrame = {
    createIfMissing()
    spark.read.schema(currentSchema).parquet(dataPath.toString)
  }

  private def currentSchema: StructType =
    if (exists) spark.read.parquet(dataPath.toString).schema else schema

  /** Ref `:19-27`: explicit rebuild (the `drop-omnata-task-tables` branch). */
  def fullRefresh(): Unit = {
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    createIfMissing()
  }

  /** Widen target types so incoming data fits — ref `:31-33`
    * (`expand_target_column_types`). String stays string (Spark strings
    * are unbounded); numeric widenings follow the standard lattice.
    */
  private[tracking] def widen(existing: StructType, incoming: StructType): StructType = {
    def wider(a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (d1: DecimalType, d2: DecimalType) =>
        DecimalType(math.max(d1.precision, d2.precision), math.max(d1.scale, d2.scale))
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (i, DoubleType) if Seq(IntegerType, LongType, FloatType).contains(i) => DoubleType
      case (DoubleType, i) if Seq(IntegerType, LongType, FloatType).contains(i) => DoubleType
      case _ => a // incompatible: keep target type, cast on write (ref keeps target too)
    }
    StructType(existing.map { f =>
      incoming.find(_.name.equalsIgnoreCase(f.name)) match {
        case Some(in) => f.copy(dataType = wider(f.dataType, in.dataType))
        case None => f
      }
    })
  }

  /** Incremental upsert — ref `incremental_upsert` call at `:34`
    * (delete-matching-keys + insert): rows in `incoming` replace existing
    * rows with the same `uniqueKey`; everything else is preserved.
    */
  def upsert(incoming: DataFrame): Unit = {
    createIfMissing()
    val existing = read()
    val widened = widen(existing.schema, incoming.schema)
    def conform(df: DataFrame): DataFrame =
      df.select(widened.map(f =>
        (if (df.columns.exists(_.equalsIgnoreCase(f.name))) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType)).as(f.name)): _*)
    val in = conform(incoming)
    val kept = conform(existing)
      .join(in.select(col(uniqueKey)), Seq(uniqueKey), "left_anti")
    atomicWrite(kept.unionByName(in))
  }

  /** Plain append (the reference's `insert into` S4 path — used for log
    * tables inside a single run where keys are fresh by construction).
    *
    * Fast path: when the existing schema already accommodates the
    * incoming rows, append new parquet files — O(incoming), the table is
    * never rewritten (the log table grows one row per pushed record
    * forever; rewriting it per run would be O(history) and fatal at
    * scale). Only a widening schema change falls back to the rewrite.
    */
  def append(incoming: DataFrame): Unit = {
    createIfMissing()
    val existing = read()
    val widened = widen(existing.schema, incoming.schema)
    def conform(df: DataFrame): DataFrame =
      df.select(widened.map(f =>
        (if (df.columns.exists(_.equalsIgnoreCase(f.name))) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType)).as(f.name)): _*)
    if (widened == existing.schema)
      conform(incoming).write.mode("append").parquet(dataPath.toString)
    else
      atomicWrite(conform(existing).unionByName(conform(incoming)))
  }

  /** Update-with-join (A6) — ref `salesforce_bulk_load.sql:52-56`:
    * `update t set col = f(u.*) from u where t.key = u.key`. `updates`
    * must carry `uniqueKey` plus the columns to stamp; unmatched target
    * rows keep their values.
    */
  def updateJoin(updates: DataFrame, setCols: Seq[String]): Unit = {
    val existing = read()
    val u = updates.select((uniqueKey +: setCols).map(col): _*)
      .withColumnsRenamed(setCols.map(c => c -> s"__new_$c").toMap)
    val updated = existing.join(u, Seq(uniqueKey), "left")
      .select(existing.columns.map { c =>
        if (setCols.contains(c)) coalesce(col(s"__new_$c"), col(c)).as(c) else col(c)
      }.toSeq: _*)
    atomicWrite(updated)
  }

  /** Data-identical rewrite into max(1, bytes/128MB) files. */
  def compact(): Unit = {
    if (!exists) return
    val bytes = fs.getContentSummary(dataPath).getLength
    val nFiles = math.max(1L, bytes / (128L << 20)).toInt
    atomicWrite(read().repartition(nFiles))
  }

  /** Rewrite via the shared scratch-dir + rename swap
    * ([[graft.util.AtomicSwap]]; the Parquet analogue of the reference's
    * backup-rename at `:19-27`). The plan is materialized to the scratch
    * dir BEFORE the old data is touched, so a failed write never
    * corrupts the table, and a crash between the swap's renames is
    * repaired on the next read/write cycle.
    */
  private def atomicWrite(df: DataFrame): Unit =
    graft.util.AtomicSwap.swapIn(fs, dataPath) { tmp =>
      df.write.mode("overwrite").parquet(tmp.toString)
    }
}

/** Partition-pruned tracking table — the 100 TB form of M2.
  *
  * The plain TrackingTable rewrites the whole relation on every upsert;
  * fine for job-count-sized tables, fatal for the log table (one row per
  * pushed record, forever). This variant hive-partitions the data by
  * `partitionCol` (for the reference's log tables the natural key is
  * `load_task_name` — each push run touches exactly one partition) and
  * uses dynamic partition overwrite so an upsert:
  *   1. prunes the read to the partitions present in `incoming`
  *      (`PartitionFilters` on the parquet scan — verified in
  *      TrackingTableSpec);
  *   2. rewrites ONLY those partitions; untouched partition directories
  *      keep their files byte-for-byte.
  */
final class PartitionedTrackingTable(
    spark: SparkSession,
    val path: String,
    val schema: StructType,
    val uniqueKey: String,
    val partitionCol: String) extends TrackingStore {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  def exists: Boolean = fs.exists(new Path(path))

  def read(): DataFrame =
    if (!exists) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.schema(schema).parquet(path)

  /** Explicit rebuild (the drop-omnata-task-tables branch). */
  def fullRefresh(): Unit =
    if (exists) fs.delete(new Path(path), true)

  /** Upsert = delete-matching-keys + insert, scoped to the incoming
    * partitions only.
    */
  def upsert(incoming: DataFrame): Unit = {
    val in = incoming.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    if (!exists) {
      in.write.partitionBy(partitionCol).parquet(path)
      return
    }
    // Driver-side partition list: |touched partitions| values, not rows.
    val touched = in.select(partitionCol).distinct().collect().map(_.get(0))
    val existingTouched = read()
      .filter(col(partitionCol).isin(touched.toIndexedSeq: _*)) // → partition pruning
      .join(in.select(col(uniqueKey)), Seq(uniqueKey), "left_anti")
    // Per-write option, not session conf: a concurrent writer in the same
    // session never observes the mutated mode, and there is no
    // save/restore race.
    existingTouched.unionByName(in)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
  }

  /** Append without key reconciliation (the in-run log insert path) —
    * creates/extends only the touched partition directories.
    */
  def append(incoming: DataFrame): Unit = {
    val in = incoming.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    in.write.mode("append").partitionBy(partitionCol).parquet(path)
  }

  /** Compact only FRAGMENTED partitions (more than one data file) into
    * one file each; already-compact partitions keep their files
    * byte-for-byte — at scale this is the nightly housekeeping pass over
    * a log table that gains one file set per push run.
    */
  def compact(): Unit = {
    if (!exists) return
    val prefix = s"$partitionCol="
    val fragmented = fs.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(s => fs.listStatus(s.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > 1)
      .map(s => java.net.URLDecoder.decode(
        s.getPath.getName.substring(prefix.length), "UTF-8"))
    if (fragmented.isEmpty) return
    read().filter(col(partitionCol).isin(fragmented.toSeq: _*))
      .repartition(col(partitionCol)) // one task (→ one file) per partition
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
  }
}

/** Bucket-clustered tracking table — the shuffle-free-anti-join form of
  * the log store.
  *
  * The recurring join at scale is the incremental push's anti-join: every
  * run, the model excludes records already logged as successful
  * (`accounts_load.sql:23-28`, README.md:144-176). The log table grows one
  * row per pushed record forever, so at 100 TB it is the BIG side of that
  * join — and with plain parquet it re-shuffles on every run. Storing the
  * log as a parquet table bucketed by the anti-join key (`record`) makes
  * the log side exchange-free: the scan's output partitioning already
  * matches the join key, so only the (per-run-sized) incoming side
  * shuffles. BucketedTrackingTableSpec asserts the plan shape.
  *
  * Appends stay O(incoming): new files land in their buckets; no rewrite.
  * Spark requires bucketed data to live in a catalog-managed table, hence
  * `table` (a table name) instead of a path.
  */
final class BucketedTrackingTable(
    spark: SparkSession,
    val table: String,
    val schema: StructType,
    val uniqueKey: String,
    val bucketKey: String,
    val buckets: Int = 32) extends TrackingStore {

  private def exists: Boolean = spark.catalog.tableExists(table)

  private def conform(df: DataFrame): DataFrame =
    df.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  private def writer(df: DataFrame, mode: String) =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketKey).sortBy(bucketKey)

  def createIfMissing(): Unit = if (!exists) {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    writer(empty, "overwrite").saveAsTable(table)
  }

  def read(): DataFrame = { createIfMissing(); spark.table(table) }

  def append(incoming: DataFrame): Unit = {
    createIfMissing()
    writer(conform(incoming), "append").saveAsTable(table)
  }

  /** Crash-safe rewrite: the full result is written to a staging table
    * BEFORE the live table is touched, then swapped in via rename (the
    * managed-table analogue of TrackingTable.atomicWrite's tmp-dir
    * dance). A failure mid-write leaves the live table intact; a failure
    * between drop and rename leaves the data recoverable in `__tmp`.
    */
  private def safeOverwrite(df: DataFrame): Unit = {
    val tmp = table + "__tmp"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    writer(df, "overwrite").saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  def upsert(incoming: DataFrame): Unit = {
    createIfMissing()
    val in = conform(incoming)
    val kept = read().join(in.select(col(uniqueKey)), Seq(uniqueKey), "left_anti")
    safeOverwrite(kept.unionByName(in))
  }

  def fullRefresh(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    createIfMissing()
  }

  /** Rewrite into one file per bucket (appends leave one file set per
    * run; bucket file counts grow unbounded otherwise). The bucketed
    * writer emits one file per (task, bucket) pair, so a single write
    * task yields exactly one file per non-empty bucket. At 100 TB a
    * compaction pass would shard this across bucket subsets (one job
    * per shard) — the single-task funnel here is the minimal correct
    * form.
    */
  def compact(): Unit = {
    if (!exists) return
    safeOverwrite(read().coalesce(1))
  }
}

object TrackingTable {
  import graft.push.Schemas

  /** The four engine-owned tracking tables (FIXTURES.md §2). */
  def sfdcLoadTasks(spark: SparkSession, base: String) =
    new TrackingTable(spark, s"$base/sfdc_load_tasks", Schemas.sfdcLoadTasks, "job_id")
  def sfdcLoadTaskLogs(spark: SparkSession, base: String) =
    new TrackingTable(spark, s"$base/sfdc_load_task_logs", Schemas.sfdcLoadTaskLogs, "job_log_entry_id")
  def sfmcLoadTasks(spark: SparkSession, base: String) =
    new TrackingTable(spark, s"$base/sfmc_load_tasks", Schemas.sfmcLoadTasks, "job_id")
  def sfmcLoadTaskLogs(spark: SparkSession, base: String) =
    new TrackingTable(spark, s"$base/sfmc_load_task_logs", Schemas.sfmcLoadTaskLogs, "job_log_entry_id")
}
