package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Oracle-checked streaming queries: each runs a REAL Structured
  * Streaming query (readStream → watermarked transform → writeStream,
  * `Trigger.AvailableNow`) to a parquet sink and returns the sink
  * contents, so the CORRECTNESS row hash-checks an actual streaming
  * execution — state store, watermark advancement, append-mode window
  * finalization — against a DuckDB batch twin, not a batch re-phrasing.
  *
  * Append-mode semantics make the twin precise: a window is emitted iff
  * `window.end <= final watermark` (= max event time − delay), so the
  * batch SQL filters on exactly that predicate. Windows still open when
  * the stream drains are correctly ABSENT from both sides — that
  * boundary is the thing worth pinning, and a bug in watermark handling
  * (emitting open windows, dropping closed ones) flips the row red.
  */
object StreamingQueries {

  /** Streaming twin of g10_time_window: watermarked 1-hour tumbling
    * windows over `events`, run as a genuine AvailableNow stream.
    */
  def streamWindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet (read as long — same
    // handling as catalog.Catalog)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file stream source requires a DIRECTORY; the testdata ships
    // single parquet files, so expose the file through a symlink dir
    val tmp = java.nio.file.Files.createTempDirectory("stream_wc").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"),
      java.nio.file.Paths.get(path))
    val src = spark.readStream.schema(schema).parquet(s"$tmp/src")
    val events =
      if (schema("ts").dataType == LongType)
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else src.withColumn("ts", col("ts").cast("timestamp"))
    val q = EventStreams.windowedCounts(events,
        watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("parquet")
      .option("path", s"$tmp/sink")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // pin the sink eagerly so the temp dir can be cleaned immediately
    val out = spark.read.parquet(s"$tmp/sink")
      .orderBy("window_start", "event_type").localCheckpoint()
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
    out
  }

  /** DuckDB batch twin: same rollup as g10_time_window, restricted to
    * windows finalized by the terminal watermark max(ts) − 10 min.
    */
  val streamWindowedCountsSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |HAVING date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
      |       <= (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE FROM events)
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_windowed_counts" -> (streamWindowedCounts _))

  val oracles: Map[String, String] = Map(
    "stream_windowed_counts" -> streamWindowedCountsSql)
}
