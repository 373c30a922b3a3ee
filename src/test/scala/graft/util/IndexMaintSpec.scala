package graft.util

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** Protocol-level tests of the shared index-maintenance plumbing that
  * don't need a SparkSession: generation reaping around crash orphans,
  * tombstone sidecar atomicity, and the cross-process (real child JVM)
  * fcntl lease.
  */
class IndexMaintSpec extends AnyFunSuite {

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"imspec_$tag").toString + "/index"

  private def commitTrivialGen(root: String, marker: String): String = {
    val stage = IndexMaint.newStageDir(root, "build")
    Files.write(Paths.get(stage, "data.txt"), marker.getBytes(UTF_8))
    IndexMaint.commitGeneration(root, stage)
  }

  test("commitGeneration keeps {new, previous live}, reaping everything else — including crash orphans newer than live") {
    val root = tmpRoot("orphan")
    commitTrivialGen(root, "g0") // live = gen-0
    // CRASH ORPHAN: a build that moved its gen directory in but died
    // before the pointer flip — numbering-wise it is NEWER than live
    Files.createDirectories(Paths.get(root, "gen-000000001"))
    Files.write(Paths.get(root, "gen-000000001", "data.txt"), "orphan".getBytes(UTF_8))
    assert(IndexMaint.liveGen(root).endsWith("gen-000000000"),
      "an orphan without a pointer flip must not be live")
    // the next commit must keep gen-0 (the real predecessor a reader may
    // hold) and reap the orphan — NOT the other way around
    commitTrivialGen(root, "g2")
    val gens = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).sorted.toSeq
    assert(IndexMaint.liveGen(root).endsWith("gen-000000002"))
    assert(gens === Seq("gen-000000000", "gen-000000002"),
      s"kept set must be {new, previous live}; the orphan must be reaped: $gens")
    // and the predecessor's files are intact for in-flight readers
    assert(new String(Files.readAllBytes(
      Paths.get(root, "gen-000000000", "data.txt")), UTF_8) === "g0")
  }

  test("tombstones are SEGMENT-scoped: a delete covers the segments present at delete time; later segments are untouched") {
    val root = tmpRoot("tombs")
    val gen = commitTrivialGen(root, "g0")
    Files.createDirectories(Paths.get(gen, "seg=base"))
    assert(IndexMaint.readTombstones(gen).isEmpty)
    assert(IndexMaint.addTombstones(gen, Seq(5L, 3L, 5L)) === 2)
    assert(IndexMaint.readTombstones(gen).toSeq ===
      Seq(("base", 3L), ("base", 5L)))
    // a segment committed AFTER the delete is outside its scope — the
    // structural "later insert wins"
    Files.createDirectories(Paths.get(gen, "seg=b0123456789abcdef"))
    assert(IndexMaint.addTombstones(gen, Seq(4L)) === 3)
    assert(IndexMaint.readTombstones(gen).toSeq === Seq(
      ("b0123456789abcdef", 4L), ("base", 3L), ("base", 4L), ("base", 5L)))
    assert(IndexMaint.tombstonedIds(gen).toSeq === Seq(3L, 4L, 5L))
    // no leftover tmp file from the atomic replace
    assert(!Files.exists(Paths.get(gen, "_tombstones.txt.tmp")))
  }

  test("tombstone sidecar is capped: past the bounded-metadata limit a delete refuses loudly, naming the deleteWhere rewrite") {
    val root = tmpRoot("tombcap")
    val gen = commitTrivialGen(root, "g0")
    Files.createDirectories(Paths.get(gen, "seg=base"))
    val cap0 = IndexMaint.tombstonePairCap
    try {
      IndexMaint.tombstonePairCap = 8
      assert(IndexMaint.addTombstones(gen, 0L until 8L) === 8)
      val e = intercept[IllegalArgumentException] {
        IndexMaint.addTombstones(gen, Seq(99L))
      }
      assert(e.getMessage.contains("deleteWhere"))
      // the refused delete mutated NOTHING: the sidecar still holds
      // exactly the prior set
      assert(IndexMaint.tombstonedIds(gen).toSeq === (0L until 8L))
    } finally IndexMaint.tombstonePairCap = cap0
  }

  test("the lease file lives INSIDE the root: deleting the index deletes its lease (no sibling litter)") {
    val root = tmpRoot("leaseloc")
    IndexMaint.withLease(root, op = "probe") { () }
    assert(Files.exists(Paths.get(root, ".lock")),
      "the lease file must live inside the root, dot-prefixed")
    assert(!Files.exists(Paths.get(root + ".lock")),
      "no sibling lock file may be littered next to the root")
    Fs.deleteRecursively(root)
    assert(!Files.exists(Paths.get(root)), "root (and its lease) fully removed")
  }

  test("cross-process lease: a REAL second JVM holding the fcntl lock blocks this process's mutation, which fails loudly naming the child") {
    val root = tmpRoot("xproc")
    Files.createDirectories(Paths.get(root))
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val child = new ProcessBuilder(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.util.LeaseHold", root, "8000")
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(child.getInputStream))
    try {
      // wait until the CHILD holds the OS lock
      var line = out.readLine()
      while (line != null && !line.contains("HELD")) line = out.readLine()
      assert(line != null, "child JVM never acquired the lease")
      // this process now contends on the fcntl path (different JVM, so
      // no in-JVM monitor or OverlappingFileLockException is involved)
      val t0 = System.nanoTime()
      val e = intercept[IllegalStateException] {
        IndexMaint.withLease(root, timeoutMs = 700L, op = "parent") { () }
      }
      assert((System.nanoTime() - t0) / 1e6 >= 700.0 - 50.0,
        "the contender must actually wait out its timeout")
      assert(e.getMessage.contains("child-hold"),
        s"the failure must name the real holder process: ${e.getMessage}")
      assert(e.getMessage.contains(s"pid=${child.pid()}"),
        s"the failure must carry the holder's pid: ${e.getMessage}")
    } finally {
      child.destroyForcibly()
      child.waitFor()
      out.close()
    }
    // with the child gone the lease is free again
    IndexMaint.withLease(root, timeoutMs = 2000L, op = "parent2") { () }
  }

  test("drainOnce: durable watermark — runs once, skips from DISK alone after the memo is cleared, re-runs on source rewrite and after a mid-drain crash") {
    val root = tmpRoot("drain")
    Files.createDirectories(Paths.get(root))
    val src = Files.createTempDirectory("drain_src").toString
    Files.write(Paths.get(src, "data.parquet"), "v1".getBytes(UTF_8))
    var runs = 0
    IndexMaint.drainOnce(root, Seq(src), "drain|t") { runs += 1 }
    assert(runs === 1, "a fresh drain must run")
    IndexMaint.drainOnce(root, Seq(src), "drain|t") { runs += 1 }
    assert(runs === 1, "a replay skips (memo fast path)")
    // the fresh-JVM contract, without a second JVM: clear the in-JVM
    // memo — the on-disk watermark ALONE must carry the skip decision
    IndexMaint.resetDrainMemoForTest()
    IndexMaint.drainOnce(root, Seq(src), "drain|t") { runs += 1 }
    assert(runs === 1,
      "a completed drain must be honored from the on-disk watermark, not the memo")
    // in-place source rewrite: the fingerprint folds into the recorded
    // key, so the stale watermark no longer matches and the drain re-runs
    Files.write(Paths.get(src, "data.parquet"), "v2-longer".getBytes(UTF_8))
    IndexMaint.resetDrainMemoForTest()
    IndexMaint.drainOnce(root, Seq(src), "drain|t") { runs += 1 }
    assert(runs === 2, "a rewritten source must invalidate the watermark")
    // crash mid-drain: the record is only written AFTER the body
    // completes, so a crashed drain leaves no watermark and re-runs
    var crashed = 0
    intercept[RuntimeException] {
      IndexMaint.drainOnce(root, Seq(src), "drain|crash") {
        crashed += 1; throw new RuntimeException("mid-drain crash")
      }
    }
    IndexMaint.drainOnce(root, Seq(src), "drain|crash") { crashed += 1 }
    assert(crashed === 2, "a crashed drain must re-run (no watermark was written)")
    IndexMaint.resetDrainMemoForTest()
    IndexMaint.drainOnce(root, Seq(src), "drain|crash") { crashed += 1 }
    assert(crashed === 2, "the completed retry's watermark holds from disk")
  }
}
