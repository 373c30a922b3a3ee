package graft.util

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Local-filesystem helpers shared by the probe/verify harnesses. */
object Fs {

  /** Filesystem fingerprint of a data directory: a fold over every
    * regular file's (relative path, size, mtime-nanos), sorted by
    * relative path so the result is independent of `Files.walk`
    * traversal order. Cheap (metadata only) and changes whenever the
    * data at `dir` is rewritten — the memo-invalidation key for
    * per-JVM derived-artifact caches (trained BPE merges, built ANN
    * indexes), so an in-place corpus rewrite (ScaleProbe regenerates
    * datasets within one JVM) can never serve stale state. Folding the
    * path means a rewrite that lands different FILE NAMES (Spark part-
    * file UUIDs change on every write) invalidates even when sizes and
    * mtimes collide within one millisecond.
    */
  def dirFingerprint(dir: String): Long = {
    val root: Path = Paths.get(dir)
    if (!Files.exists(root)) 0L
    else {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map { p =>
          (root.relativize(p).toString, Files.size(p),
            Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS))
        }
        .toSeq.sortBy(_._1)
        .foldLeft(0L) { case (h, (rel, size, mtime)) =>
          val hp = rel.foldLeft(h)((a, c) => 31L * a + c)
          31L * (31L * hp + size) + mtime
        }
      finally s.close()
    }
  }

  /** Recursively delete `dir` if it exists (children before parents).
    * Harness-side only — the engine's data paths go through Hadoop
    * filesystems, never this.
    */
  /** Stage DataFrame batches as an ordered file-stream source: one
    * parquet file per batch under `<tmp>/<sub>`, named `batchNN` with
    * mtimes spaced a minute apart, so a `maxFilesPerTrigger=1` reader
    * drains them as ordered micro-batches — the one staging shape every
    * CDC/ingest harness query uses. Returns the source directory.
    */
  def stageBatchFiles(tmp: String, sub: String,
      batches: Seq[org.apache.spark.sql.DataFrame]): String = {
    val srcDir = s"$tmp/$sub"
    Files.createDirectories(Paths.get(srcDir))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = s"$tmp/.stage_$sub$i"
      rows.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(srcDir, f"batch$i%02d.parquet")
      Files.move(part.toPath, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    srcDir
  }

  /** Total bytes of regular files under `dir` (0 if absent) — the
    * metadata-only size a tiered merge policy tiers segments by.
    */
  def treeBytes(dir: String): Long = {
    val root: Path = Paths.get(dir)
    if (!Files.exists(root)) 0L
    else {
      val s = Files.walk(root)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
      finally s.close()
    }
  }

  /** Recreate `src`'s directory tree under `dst` with every regular
    * file HARD-LINKED, not copied — O(files) metadata operations, zero
    * data bytes moved. This is how a tiered segment merge carries the
    * untouched segments into a new generation: the link shares the
    * inode, so reaping the old generation directory later just drops a
    * name, never the bytes a newer generation still references. Safe
    * against the protocol's sidecar updates too — every in-place
    * sidecar write is tmp + ATOMIC_MOVE (a NEW inode replacing the
    * name), so a linked file can never be mutated through the other
    * name. On an object store this maps to manifest reuse (the new
    * snapshot lists the old segment objects); locally, falls back to a
    * copy if the filesystem refuses the link.
    */
  def linkTree(src: String, dst: String): Unit = {
    val from: Path = Paths.get(src)
    val to: Path = Paths.get(dst)
    val walk = Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val target = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        try Files.createLink(target, p)
        catch { case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException =>
          Files.copy(p, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally walk.close()
  }

  def deleteRecursively(dir: String): Unit = {
    val root: Path = Paths.get(dir)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
      finally walk.close()
    }
  }

  /** Recursively copy `src` into `dst` (created if absent). Harness and
    * local-state use only — same caveat as [[deleteRecursively]]; at
    * cluster scale state cloning is an object-store server-side copy.
    */
  def copyRecursively(src: String, dst: String): Unit = {
    val from: Path = Paths.get(src)
    val to: Path = Paths.get(dst)
    val walk = Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val target = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
  }

  private val sessionDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var hookInstalled = false

  /** One temp directory per (`name`, `key`) per JVM, deleted at JVM
    * exit.
    *
    * Operators whose contract needs a scratch write location (shard
    * output, a persisted index the oracle row rebuilds) use this
    * instead of a fresh `createTempDirectory` per invocation: repeated
    * runs (benchmark repetitions, verify + bench in one JVM) overwrite
    * the SAME path via `mode("overwrite")` rather than leaking a new
    * directory each time, and a single shutdown hook reclaims them all.
    *
    * `key` scopes the reuse: callers pass the logical input (the
    * dataset directory), so two datasets processed in one JVM — or two
    * concurrently-running specs over different inputs — get DISTINCT
    * scratch paths and can never clobber each other mid-read. Reuse
    * (and hence the overwrite) only ever happens for repeated runs of
    * the same operator over the same input, where the rewrite is
    * idempotent.
    */
  def sessionTempDir(name: String, key: String = ""): String = {
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          sessionDirs.values().asScala.foreach { d =>
            try deleteRecursively(d) catch { case _: Exception => () }
          }))
        hookInstalled = true
      }
    }
    val mapKey = if (key.isEmpty) name else s"$name|$key"
    sessionDirs.computeIfAbsent(mapKey,
      _ => Files.createTempDirectory(name).toString)
  }
}
