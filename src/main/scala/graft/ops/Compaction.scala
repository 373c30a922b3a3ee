package graft.ops

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lake-maintenance sink every 100 TB
  * deployment runs on a schedule. Streaming ingests, incremental pushes
  * and per-batch appends (this repo's own TrackingTable/FileStreams
  * outputs included) accumulate thousands of KB-sized parquet files per
  * partition; at scale that murders scan planning (one task per tiny
  * file, listing/NameNode pressure, per-file row-group overhead).
  * Compaction rewrites a directory into ~`targetBytes` files and swaps
  * the result in atomically.
  *
  * Design:
  *  - file PLANNING is driver-side metadata work: the input listing
  *    (path, bytes) fixes the output file count — `ceil(total /
  *    targetBytes)` — without reading a data byte;
  *  - the rewrite is one `repartition(n)` pass (row-group-preserving
  *    coalesce would be even cheaper but parquet offers no safe
  *    file-level concat; one read+write per maintenance window is the
  *    accepted industry cost);
  *  - the swap is atomic directory renames (same discipline as
  *    `tracking.TrackingTable`): readers see the old file set or the
  *    new one, never a mix;
  *  - content is preserved exactly — compaction only repacks rows into
  *    fewer files (spec-checked by full multiset equality).
  *
  * Hive-style partitioned layouts compact per partition directory
  * ([[compactTable]]), so a skewed partition gets its own file budget
  * and untouched partitions are not rewritten (`minFiles` gate).
  */
object Compaction {

  private def dataFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }.toSeq
      finally s.close()
    }

  /** Rewrite `dir`'s parquet files into `ceil(totalBytes/targetBytes)`
    * files (if it currently has ≥ `minFiles`). Returns (files_before,
    * files_after, bytes_total); a skipped dir returns files_after ==
    * files_before.
    */
  def compactDir(spark: SparkSession, dir: String, targetBytes: Long,
      minFiles: Int = 2): (Int, Int, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = dataFiles(Paths.get(dir))
    val bytes = files.map(Files.size).sum
    if (files.size < minFiles) return (files.size, files.size, bytes)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir + ".compact_tmp"
    val old = dir + ".compact_old"
    graft.util.Fs.deleteRecursively(tmp)
    graft.util.Fs.deleteRecursively(old)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp)
    Files.move(Paths.get(dir), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(dir))
    graft.util.Fs.deleteRecursively(old)
    (files.size, dataFiles(Paths.get(dir)).size, bytes)
  }

  /** Compact every `k=v` partition directory of a Hive-layout table
    * independently; returns (partition, files_before, files_after)
    * per compacted partition.
    */
  def compactTable(spark: SparkSession, dir: String, targetBytes: Long,
      minFiles: Int = 2): Seq[(String, Int, Int)] = {
    val root = Paths.get(dir)
    val parts = {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    parts.map { p =>
      val (before, after, _) = compactDir(spark, p.toString, targetBytes, minFiles)
      (p.getFileName.toString, before, after)
    }
  }
}
