package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Name → DataFrame registry: the Spark-native equivalent of dbt's `ref()`
  * (reference: `integration_tests/models/salesforce_loads/accounts_load.sql:16`
  * resolves model names to relations at compile time).
  *
  * Two layers:
  *   - base tables: lazily-loaded parquet under a scale-factor directory
  *     (the driver's `/root/testdata/sf*` layout, one `<name>.parquet` each);
  *   - registered models: named DataFrames produced by the engine
  *     (tracking tables, rollups), which shadow base tables.
  *
  * At 100 TB the base layer would be a real metastore/Delta catalog; the
  * contract (`ref(name): DataFrame`) is unchanged — Catalyst sees the same
  * relation either way, so filter/column pushdown into the parquet scan is
  * preserved.
  */
final class Catalog(spark: SparkSession, sfDir: String) {
  private val registered = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** dbt `ref('name')`. Registered models win over base parquet tables. */
  def ref(name: String): DataFrame =
    registered.getOrElse(name, Catalog.basePlan(spark, sfDir, name))

  /** Register (or replace) a model's relation, like a dbt model build. */
  def register(name: String, df: DataFrame): Unit = registered.put(name, df)

  def isRegistered(name: String): Boolean = registered.contains(name)

  /** Expose every base table as a temp view so `spark.sql` models work. */
  def registerViews(names: Seq[String]): Unit =
    names.foreach(n => ref(n).createOrReplaceTempView(n))
}

object Catalog {
  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String): Catalog =
    new Catalog(spark, sfDir)

  /** Session memo of base-table LAZY PLANS keyed by (session, dir,
    * table, filesystem fingerprint) — the metadata a real metastore
    * serves for free: `spark.read.parquet` re-lists the path and
    * re-reads footers for schema on EVERY call, which is pure
    * driver-side latency repeated by all ~200 registered queries (and
    * again per bench pass). The memoized value is an unexecuted plan —
    * every action over it still scans the parquet from disk, so no
    * result or data is ever cached; the fingerprint key makes an
    * in-place rewrite (ScaleProbe regenerating a dataset) invalidate
    * exactly like the build memos do. Bounded + stale-evicting so
    * rewritten dirs do not accumulate dead plans.
    */
  private val planMemo =
    new graft.util.BoundedCache[(Int, String, String, Long), DataFrame](max = 64)

  private[catalog] def basePlan(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = (System.identityHashCode(spark), sfDir, name,
      graft.util.Fs.dirFingerprint(path))
    planMemo.get(key).getOrElse {
      // `events.ts` is TIMESTAMP(NANOS) parquet, which Spark rejects; read
      // nanos as long and convert to a microsecond timestamp (the data is
      // µs-precision, so truncation is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df0 = spark.read.parquet(path)
      val df =
        if (name == "events" && df0.schema("ts").dataType == LongType)
          // `div` = integer division. `/` would be DOUBLE division: epoch
          // nanos (~1.7e18) exceed double's 53-bit mantissa, so the quotient
          // rounds by up to ±256 ns and can land on the wrong microsecond.
          df0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else df0
      planMemo.putReplacing(key, df)(
        k => (k._1, k._2, k._3) == (key._1, key._2, key._3) && k != key)
      df
    }
  }

  private val countMemo = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Memoized row count of a BASE parquet table — a data statistic, the
    * kind a real metastore serves from metadata for free. The driver's
    * testdata directories are immutable for a session, so caching by
    * (dir, table) is sound; never use this for registered/mutable
    * relations. Callers use it to size computed partitioners (e.g.
    * prepPipeline's monotone bucket) without paying a count job per
    * query build.
    */
  def cachedRowCount(spark: SparkSession, sfDir: String, name: String): Long =
    countMemo.getOrElseUpdate(s"$sfDir/$name",
      new Catalog(spark, sfDir).ref(name).count())
}
