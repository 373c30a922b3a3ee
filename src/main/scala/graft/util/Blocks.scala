package graft.util

import org.apache.spark.sql.SparkSession

/** Session-lifetime block hygiene for the driver-contract harnesses.
  *
  * Every registered query re-derives its own `localCheckpoint` pins per
  * invocation (postings fetches, mutation batches, hybrid pages), and a
  * truncated-lineage block is only reclaimed when a driver GC lets the
  * ContextCleaner notice the RDD is unreachable — so a long session
  * (185-query bench, two passes) accumulates hundreds of dead blocks
  * and reads as memory drag that is indistinguishable from co-tenant
  * noise in the telemetry.
  */
object Blocks {

  /** Drop every persistent RDD block in the session — called by the
    * harnesses BETWEEN units of work, after a query's result is fully
    * consumed. Safe there and only there: graft's session memos hold
    * index handles, paths and counts — never DataFrames — so no block
    * outlives the invocation that pinned it by design, and anything
    * still registered is garbage awaiting GC. A live production server
    * holding result DataFrames across requests must scope its own pins
    * instead of calling this.
    */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

  /** Resident set size of this JVM in MB (Linux /proc; -1 elsewhere) —
    * the "is the session dragging or is the machine loaded?" telemetry
    * next to loadavg in BENCH_FULL.
    */
  def rssMb(): Long =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/self/status")).stream()
        .filter(_.startsWith("VmRSS:")).findFirst()
      if (line.isPresent) line.get.split("\\s+")(1).toLong / 1024 else -1L
    } catch { case _: Throwable => -1L }

  /** Cumulative GC time of this JVM in seconds. */
  def gcSec(): Double =
    try {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    } catch { case _: Throwable => -1.0 }

  /** Run `body` with a job description naming the OPERATOR phase
    * (guide §1.5) — thread-local, restored after, so callers' labels
    * (Bench's per-query `graft:<name>`) are shadowed only for the
    * phase's own jobs. Purely observational: listener/UI attribution
    * (`ProfQ`) reads it; no plan or timing effect.
    */
  def labeled[A](spark: SparkSession, desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
