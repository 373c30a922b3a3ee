package graft.push

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dbt built-in `incremental` materialization (M4) as used by the
  * reference's rollup model (`transactions_daily.sql:1-3,16-21`):
  * first run writes the full result; later runs append only rows whose
  * watermark column exceeds `max(watermark)` of the existing relation
  * (the `is_incremental()` scalar-subquery branch, `:19`).
  *
  * Scale: the watermark is a 1-value aggregate over the existing table's
  * watermark column (parquet column stats make this a metadata-ish scan);
  * the append never rewrites history. Partition the target by the
  * watermark column's date at real scale so appends create new partitions.
  */
final class IncrementalTable(spark: SparkSession, path: String, watermarkCol: String) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  def exists: Boolean = fs.exists(new Path(path))

  def read(): DataFrame = spark.read.parquet(path)

  /** Run one incremental build: `build` is the model query (full result). */
  def run(build: => DataFrame): Unit = {
    if (!exists) {
      build.write.mode("overwrite").parquet(path)
    } else {
      val wm = read().agg(max(col(watermarkCol))).head()
      val incoming =
        if (wm.isNullAt(0)) build
        else build.filter(col(watermarkCol) > lit(wm.get(0)))
      incoming.write.mode("append").parquet(path)
    }
  }

  def fullRefresh(build: => DataFrame): Unit = {
    if (exists) fs.delete(new Path(path), true)
    run(build)
  }
}
