package graft.util

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Shared maintenance plumbing for persisted ANN index directories
  * ([[graft.ops.Ivf]] and [[graft.ops.Pq]]) — ONE implementation so a
  * protocol fix cannot silently reach one index family and miss the
  * other (earlier per-family copies drifted exactly that way).
  *
  * == Durable commit protocol ==
  *
  * An index root is a directory of GENERATIONS plus an atomically
  * replaced pointer file:
  *
  * {{{
  * <root>/
  *   _live.txt              current generation name (atomic replace)
  *   gen-000000000/         a generation
  *     seg=base/…           build/rebalance output (cid=… dirs inside
  *                          for a cell-partitioned index)
  *     seg=b<hash16>/…      one committed append batch, with its
  *                          _token.txt INSIDE the segment
  *     _applied.txt         consolidated tokens carried from prior
  *                          generations at rebalance
  *     _…sidecars           quantizer/codebook/fit-stat sidecars
  *   .stage-…/              uncommitted staging (invisible to readers;
  *                          crashed leftovers reaped under the lease)
  *   .lock                  cross-process lease file (dies with the root)
  * }}}
  *
  * Every mutation is staged fully and committed by a SINGLE atomic
  * rename on the same filesystem:
  *  - an APPEND stages its encoded parquet plus `_token.txt` and
  *    commits by moving the stage to `gen-N/seg=b<hash>` — the data
  *    and its replay token become visible together, so the old
  *    "parquet committed but token line lost" replay window does not
  *    exist;
  *  - a BUILD/REBALANCE stages a complete new generation (data,
  *    sidecars, carried tokens) and commits by atomically replacing
  *    `_live.txt` — a crash at any point leaves the previous
  *    generation live and only reapable garbage behind.
  *
  * Readers resolve `_live.txt` once and then read that generation
  * directory; [[commitGeneration]] keeps ONE predecessor generation,
  * so an in-flight query (or a held DataFrame) survives one
  * subsequent rebalance — the live directory is never absent, there
  * is no half-swapped state to observe. On an object store both
  * commits map to the native conditional-put / manifest-pointer flip.
  *
  * == Cross-process lease ==
  *
  * Mutations additionally hold an OS file lock on `<root>/.lock`
  * ([[withLease]]): a second JVM (or a second thread — in-JVM
  * contention degrades to the same wait loop) attempting to mutate
  * the same index waits, then FAILS LOUDLY naming the holder instead
  * of interleaving stage/commit sequences. Reads take no lease.
  */
object IndexMaint {

  private val locks =
    new scala.collection.concurrent.TrieMap[String, Object]()

  /** One monitor per index path — the in-JVM serialization layer under
    * which mutators acquire the cross-process lease (paths are globally
    * unique, so IVF and PQ sharing the map is harmless).
    */
  def lockFor(path: String): Object = locks.getOrElseUpdate(path, new Object)

  // ---- cross-process lease --------------------------------------------------

  /** Default wait before a contended mutation fails loudly; specs dial
    * it down to exercise the timeout path.
    */
  @volatile var defaultLeaseTimeoutMs: Long = 120000L

  /** Run `f` holding an exclusive OS file lock on `<root>/.lock`. Waits
    * up to `timeoutMs` for a holder (another process's fcntl lock, or
    * another thread of this JVM — [[OverlappingFileLockException]] is
    * treated as "held, wait"), then throws naming the recorded holder.
    * Advisory, like every file lease: it serializes cooperating graft
    * processes, it cannot stop an arbitrary foreign writer.
    */
  def withLease[A](root: String, timeoutMs: Long = -1L,
      op: String = "maintenance")(f: => A): A = {
    val waitMs = if (timeoutMs >= 0) timeoutMs else defaultLeaseTimeoutMs
    // Inside the root (dot-prefixed, so parquet discovery ignores it):
    // deleting the index directory deletes its lease file with it.
    val lockPath = Paths.get(root, ".lock")
    Files.createDirectories(lockPath.getParent)
    val ch = FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      var lock: FileLock = null
      val deadline = System.nanoTime() + waitMs * 1000000L
      while (lock == null) {
        lock =
          try ch.tryLock()
          catch { case _: OverlappingFileLockException => null }
        if (lock == null) {
          if (System.nanoTime() > deadline) {
            val holder =
              try new String(Files.readAllBytes(lockPath), UTF_8).trim
              catch { case _: Exception => "unknown" }
            throw new IllegalStateException(
              s"index lease on $root is held by [$holder] — refused to mutate " +
                s"after ${waitMs} ms. Another process (or thread) is appending or " +
                "rebalancing this index; retry when it finishes, or raise the " +
                "lease timeout (IndexMaint.defaultLeaseTimeoutMs).")
          }
          Thread.sleep(50)
        }
      }
      try {
        val info = s"pid=${ProcessHandle.current().pid()} op=$op " +
          s"since=${java.time.Instant.now()}"
        ch.truncate(0)
        ch.write(java.nio.ByteBuffer.wrap(info.getBytes(UTF_8)))
        f
      } finally lock.release()
    } finally ch.close()
  }

  /** The shared mutation choreography every index-family write runs
    * under: the per-path in-JVM monitor, the cross-process lease, and a
    * reap of crashed staging leftovers. ONE implementation so the
    * ordering (monitor → lease → reap) cannot drift between families.
    */
  def withMutation[A](root: String, op: String)(f: => A): A =
    lockFor(root).synchronized {
      withLease(root, op = op) {
        reapStages(root)
        f
      }
    }

  /** The CDC verbs every index family's `applyCdc*` accepts — the
    * reference's `load_type` surface (delete, hardDelete, insert,
    * update, upsert; README.md:68) collapsed to the three an index can
    * mean: `update` on an index IS `upsert` (re-encode), and
    * `hardDelete` ≡ `delete` (tombstones already are the soft state;
    * compaction is the hard reclamation).
    */
  val CdcOps: Set[String] = Set("insert", "upsert", "delete")

  /** Validate a CDC batch's `op` column (loudly, before any mutation)
    * and return the ids the mutation must tombstone — the delete+upsert
    * rows' `idCol`, distinct, as driver metadata (the tombstone
    * contract). Shared by every family's applyCdc so the verb set and
    * the delete/upsert split cannot drift between families.
    */
  def cdcDoomedIds(pinned: org.apache.spark.sql.DataFrame, idCol: String,
      context: String): IndexedSeq[Long] = {
    import org.apache.spark.sql.functions.col
    val ops = pinned.select(col("op")).distinct()
      .collect().map(_.getString(0)).toSet
    val unknown = ops -- CdcOps
    require(unknown.isEmpty, s"$context: unknown op(s) " +
      s"${unknown.mkString(", ")} — expected ${CdcOps.mkString("/")}")
    pinned.filter(col("op").isin("delete", "upsert"))
      .select(col(idCol)).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
  }

  /** The rows a CDC mutation inserts — insert+upsert, op dropped. */
  def cdcAdds(pinned: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    pinned.filter(col("op").isin("insert", "upsert")).drop("op")
  }

  /** Fail loudly if a survivor relation carries duplicate ids — the
    * post-reclamation invariant every screen's top-k page relies on. A
    * duplicate here means a producer violated the `insert` contract
    * (sent insert for an id that already existed; insert skips the
    * tombstone write by design, so both copies survive) — the remedy is
    * `upsert`. Checked at compaction, where the survivors were just
    * written: one id-column aggregate over the fresh stage, never a
    * second corpus pass.
    */
  def requireUniqueIds(survivors: org.apache.spark.sql.DataFrame,
      idCol: String, context: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    val r = survivors.agg(
      count(lit(1)).as("n"), countDistinct(col(idCol)).as("d")).head()
    require(r.getLong(0) == r.getLong(1),
      s"$context: ${r.getLong(0) - r.getLong(1)} duplicate $idCol rows in the " +
        "compacted survivors — a producer re-added existing ids without " +
        "tombstoning the old copies (a CDC `insert` for an existing id, or " +
        "overlapping append batches); use `upsert` (delete-then-insert) " +
        "for existing ids")
  }

  /** The token-guarded segment-commit choreography shared by every
    * index family's append / upsert / CDC mutation: resolve the live
    * generation under the mutation lease, no-op (false) if `token` is
    * already applied, otherwise run `mutate(gen, stage)` — the family's
    * tombstone writes and staged data writes — and commit the stage as
    * the token's segment in one atomic rename. ONE implementation so
    * the families cannot drift on the ordering the protocol's safety
    * rests on: token check FIRST (a replay is a structural no-op, and
    * in particular cannot re-add tombstones over a later re-insert),
    * tombstones inside `mutate` land BEFORE the commit (the
    * at-least-once retry heals the only torn crash state), and the
    * token becomes visible WITH the data, never separately.
    */
  def tokenGuardedSegment(root: String, token: String, tag: String)(
      mutate: (String, String) => Unit): Boolean = {
    requireValidToken(token)
    withMutation(root, op = s"$tag:$token") {
      val gen = liveGen(root)
      if (appliedTokens(gen).contains(token)) false
      else {
        val stage = newStageDir(root, tag)
        mutate(gen, stage)
        commitSegment(gen, stage, token)
        true
      }
    }
  }

  // ---- generations ----------------------------------------------------------

  private val LivePointer = "_live.txt"
  private val PrevPointer = "_prev.txt"
  private val GenPattern = "gen-(\\d{9})".r

  /** The reader-grace predecessor the LAST commit retained, VALIDATED
    * against the current live generation: the record is a (live, prev)
    * pair, and a pair whose live half is not `liveName` is stale (a
    * crash between the pointer flip and the record write, in either
    * order) — callers must then refuse to guess, exactly as for a
    * pre-sidecar root. None = unrecorded/stale; Some(None) = recorded
    * "no predecessor"; Some(Some(n)) = n.
    */
  def prevGenName(root: String, liveName: String): Option[Option[String]] = {
    val p = Paths.get(root, PrevPointer)
    if (!Files.exists(p)) None
    else {
      val body = new String(Files.readAllBytes(p), UTF_8).trim
      val i = body.indexOf(',')
      if (i < 0 || body.substring(0, i) != liveName) None
      else {
        val prev = body.substring(i + 1)
        Some(if (prev.isEmpty) None else Some(prev))
      }
    }
  }

  private def genNumber(name: String): Option[Long] = name match {
    case GenPattern(n) => Some(n.toLong)
    case _ => None
  }

  private def genDirs(root: String): Seq[(Long, Path)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Nil
    else {
      val s = Files.list(r)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .flatMap(p => genNumber(p.getFileName.toString).map(_ -> p))
          .toSeq.sortBy(_._1)
      } finally s.close()
    }
  }

  /** The live generation's absolute path, or None if the index has
    * never committed one (a crashed first build leaves only stages).
    */
  def liveGenOpt(root: String): Option[String] = {
    val p = Paths.get(root, LivePointer)
    if (!Files.exists(p)) None
    else {
      val name = new String(Files.readAllBytes(p), UTF_8).trim
      val d = Paths.get(root, name)
      if (Files.isDirectory(d)) Some(d.toString) else None
    }
  }

  def liveGen(root: String): String = liveGenOpt(root).getOrElse(
    throw new IllegalStateException(
      s"$root has no live generation — the index was never committed " +
        "(a crashed build leaves only stage directories; rebuild it)"))

  /** Fresh staging directory inside the root (same filesystem as the
    * commit target, so every commit rename is atomic). Dot-prefixed:
    * invisible to parquet discovery, reapable garbage after a crash.
    */
  def newStageDir(root: String, tag: String): String = {
    Files.createDirectories(Paths.get(root))
    Files.createTempDirectory(Paths.get(root), s".stage-$tag-").toString
  }

  /** Reap crashed staging leftovers. Callers hold the lease: any stage
    * directory observed while WE hold it belongs to a crashed mutation.
    */
  def reapStages(root: String): Unit = {
    val r = Paths.get(root)
    if (Files.isDirectory(r)) {
      val s = Files.list(r)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(".stage-"))
          .toSeq.foreach(p => Fs.deleteRecursively(p.toString))
      } finally s.close()
    }
  }

  /** Commit a fully-staged generation: move the stage in as
    * `gen-<next>`, atomically replace the live pointer, reap
    * generations older than the PREDECESSOR (kept so an in-flight
    * reader of the previous generation survives this commit). Returns
    * the committed generation's path. Callers hold [[lockFor]] +
    * [[withLease]].
    */
  def commitGeneration(root: String, stage: String): String = {
    // The kept set derives from the LIVE POINTER, not directory
    // numbering: a crash between the gen-dir move and the pointer flip
    // leaves an orphan generation newer than live, and number-based
    // reaping would keep the orphan while deleting the real
    // predecessor a reader may still hold.
    val prevLive = liveGenOpt(root)
      .map(p => Paths.get(p).getFileName.toString)
    val next = genDirs(root).lastOption.map(_._1 + 1).getOrElse(0L)
    val name = f"gen-$next%09d"
    val target = Paths.get(root, name)
    Files.move(Paths.get(stage), target)
    val tmp = Paths.get(root, LivePointer + ".tmp")
    Files.write(tmp, name.getBytes(UTF_8))
    Files.move(tmp, Paths.get(root, LivePointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // record WHICH generation is the reader-grace predecessor: number
    // ordering cannot distinguish it from a crash-orphan that was moved
    // but never pointed to, and [[fsckRepair]] must not guess (the
    // orphan would be kept and the copy a reader still holds reaped).
    // The record is the (live, prev) PAIR: readers honor it only when
    // its live half matches the current pointer, so a crash between
    // this write and any neighboring step leaves a record that is
    // either consistent or visibly stale — never silently wrong.
    val ptmp = Paths.get(root, PrevPointer + ".tmp")
    Files.write(ptmp, s"$name,${prevLive.getOrElse("")}".getBytes(UTF_8))
    Files.move(ptmp, Paths.get(root, PrevPointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // an unparseable pin manifest freezes generation reaping (None):
    // the commit itself still lands — data retention over tidiness
    pinnedGenNames(root).foreach { pinned =>
      genDirs(root).foreach { case (_, p) =>
        val n = p.getFileName.toString
        if (n != name && !prevLive.contains(n) && !pinned.contains(n))
          Fs.deleteRecursively(p.toString)
      }
    }
    target.toString
  }

  // ---- segments (atomic append commit) --------------------------------------

  private val TokenFile = "_token.txt"
  private val ConsolidatedTokens = "_applied.txt"

  /** Token shape check — run BEFORE staging so a malformed token fails
    * fast.
    */
  def requireValidToken(token: String): Unit =
    require(token.nonEmpty && !token.contains("\n") && !token.contains("\r"),
      "append token must be a non-empty single line")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  /** Deterministic segment directory name for a token. */
  def segmentName(token: String): String = "seg=b" + md5Hex(token).take(16)

  /** Commit a staged append: write the token INSIDE the stage, then one
    * atomic rename into the live generation. A crash before the rename
    * leaves an invisible stage (reaped later); after it, the data and
    * its token are both visible — there is no state in which the batch
    * is applied but unrecorded. Callers hold [[lockFor]] + [[withLease]]
    * and have already checked [[appliedTokens]].
    */
  def commitSegment(genDir: String, stage: String, token: String): Unit = {
    requireValidToken(token)
    Files.write(Paths.get(stage, TokenFile), (token + "\n").getBytes(UTF_8))
    val target = Paths.get(genDir, segmentName(token))
    if (Files.exists(target)) Fs.deleteRecursively(stage)
    else Files.move(Paths.get(stage), target)
  }

  /** Commit a tokenless segment (the non-idempotent append path —
    * callers that manage their own replay story). Name is unique, not
    * content-derived.
    */
  def commitSegmentAnon(genDir: String, stage: String): Unit = {
    val name = "seg=a" + java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    Files.move(Paths.get(stage), Paths.get(genDir, name))
  }

  /** Tokens of batches already folded into this generation: the
    * consolidated sidecar (carried across rebalances) plus each
    * committed segment's own token file.
    */
  def appliedTokens(genDir: String): Set[String] = {
    val g = Paths.get(genDir)
    val segTokens =
      if (!Files.isDirectory(g)) Set.empty[String]
      else {
        val s = Files.list(g)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("seg=b"))
            .flatMap { p =>
              val t = p.resolve(TokenFile)
              if (Files.exists(t))
                Some(new String(Files.readAllBytes(t), UTF_8).trim)
              else None
            }.toSet
        } finally s.close()
      }
    consolidatedTokensOf(genDir) ++ segTokens
  }

  /** JUST the consolidated sidecar's tokens (no segment walk) — what a
    * partial merge starts from when it folds the merged segments' own
    * tokens into the successor's consolidated set while the untouched
    * segments keep carrying theirs in-place.
    */
  def consolidatedTokensOf(genDir: String): Set[String] = {
    val p = Paths.get(genDir, ConsolidatedTokens)
    if (!Files.exists(p)) Set.empty[String]
    else new String(Files.readAllBytes(p), UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).toSet
  }

  /** The token a committed segment carries, if any. */
  def segmentTokenOf(genDir: String, seg: String): Option[String] = {
    val t = Paths.get(genDir, s"seg=$seg", TokenFile)
    if (Files.exists(t)) Some(new String(Files.readAllBytes(t), UTF_8).trim)
    else None
  }

  /** Deterministic name for the segment a tiered merge re-lands a
    * group as: content-addressed by the merged segment names, prefixed
    * `m` so it can never collide with `base` or a token segment
    * (`b<md5-16>`) and is exempt from the token-file fsck check (its
    * tokens live in the consolidated sidecar).
    */
  def mergedSegmentName(merged: Seq[String]): String =
    "m" + md5Hex(merged.sorted.mkString("\n")).take(16)

  /** Write a tombstone sidecar into a STAGED generation (plain write —
    * it becomes visible atomically with the generation commit).
    */
  def stageTombstonePairs(stageDir: String, pairs: Array[(String, Long)]): Unit =
    Files.write(Paths.get(stageDir, TombstoneFile), tombstoneLines(pairs))

  /** The ONE serializer for tombstone sidecar lines — staged (merge)
    * and in-place (delete) writers must produce byte-identical formats
    * or [[readTombstones]] would parse them differently by provenance.
    */
  private def tombstoneLines(pairs: Array[(String, Long)]): Array[Byte] =
    pairs.sorted.map { case (s, id) => s"$s,$id" }
      .mkString("", "\n", if (pairs.isEmpty) "" else "\n").getBytes(UTF_8)

  /** Carry a generation's root-level sidecar FILES (quantizer/codebook/
    * stats/derivation-key sidecars — whatever the family keeps there)
    * verbatim into a staged successor whose live CONTENT is unchanged
    * (a partial merge). Excludes the two the merge rewrites itself
    * (tombstones, consolidated tokens) and torn `*.tmp` debris.
    */
  def carryGenRootFiles(genDir: String, stageDir: String): Unit = {
    val g = Paths.get(genDir)
    val s = Files.list(g)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(_.getFileName.toString)
        .filterNot(n => n == TombstoneFile || n == ConsolidatedTokens ||
          n.endsWith(".tmp"))
        .toList
        .foreach { n =>
          Files.copy(g.resolve(n), Paths.get(stageDir, n),
            StandardCopyOption.REPLACE_EXISTING)
        }
    } finally s.close()
  }

  /** Write the consolidated token sidecar into a STAGED generation
    * (whole-file; becomes visible with the generation commit). A
    * rebalance carries `appliedTokens(oldGen)` forward so batches
    * already re-encoded into the new generation stay deduplicated.
    */
  def writeConsolidatedTokens(stageDir: String, tokens: Set[String]): Unit =
    Files.write(Paths.get(stageDir, ConsolidatedTokens),
      tokens.toSeq.sorted.mkString("", "\n", if (tokens.isEmpty) "" else "\n")
        .getBytes(UTF_8))

  // ---- build-key sidecar (reopen-not-rebuild) --------------------------------

  private val BuildKeyFile = "_build_key.txt"

  /** Persist the memo key an index was BUILT under — (source
    * fingerprint, build shape) rendered by the family — into a staged
    * generation, so it commits atomically with the data. This is what
    * lets a later `buildIndexCached` MISS (LRU eviction, session
    * restart) distinguish "the identical index is already committed —
    * reopen it, read-only" from "the source or shape changed — rebuild".
    * Without it every miss is a rebuild, which silently RE-TRAINS AND
    * REWRITES a durable index from inside a read path.
    */
  def writeBuildKey(stageDir: String, key: String): Unit = {
    require(key.nonEmpty && !key.contains("\n") && !key.contains("\r"),
      "build key must be a non-empty single line")
    Files.write(Paths.get(stageDir, BuildKeyFile), key.getBytes(UTF_8))
  }

  /** The committed generation's build key, if the generation recorded
    * one (pre-sidecar indexes and direct `buildIndex` callers did not —
    * absence simply means "cannot prove reuse, rebuild"). A sidecar
    * that cannot be read is treated as absent, never a crash: the worst
    * outcome of a torn key is one redundant rebuild.
    */
  def readBuildKey(genDir: String): Option[String] = {
    val p = Paths.get(genDir, BuildKeyFile)
    if (!Files.exists(p)) None
    else scala.util.Try(new String(Files.readAllBytes(p), UTF_8).trim)
      .toOption.filter(_.nonEmpty)
  }

  /** Carry the build key from the live generation into a staged
    * successor. Every content-preserving commit (compact, deleteWhere,
    * rebalance) carries it: the successor still DERIVES from the same
    * (source, shape) build — mutations on top are owned by their own
    * token guards and memo layers — so a later cached-build call must
    * reopen it rather than rebuild from source (a rebuild would undo a
    * compaction's file collapse, resurrect a retention delete until its
    * sweep re-runs, and revert a drift-repair rebalance).
    */
  def carryBuildKey(gen: String, stage: String): Unit =
    readBuildKey(gen).foreach(writeBuildKey(stage, _))

  private val SweepKeysFile = "_sweep_keys.txt"

  /** Persist the SET of bulk-delete compositions (retention sweeps,
    * predicate takedowns) already applied to this generation — the
    * [[writeBuildKey]] idea extended to the rewrite verbs: a
    * deleteWhere is a durable generation-replacing compaction, so a
    * session-memo miss that cannot prove "this sweep already ran" MUST
    * re-run it — a full index rewrite from inside what the caller
    * thinks is a read path. With the key present the miss reopens
    * instead. A set (one key per line, sorted) because independent
    * strata deletes compose on one index.
    *
    * CONTRACT: a sweep key records a ONE-SHOT composition ("this
    * predicate was applied to this derivation"), not a standing policy
    * — rows appended after the sweep that match the predicate are NOT
    * re-deleted by the key check. A recurring retention policy re-runs
    * `deleteWhere` under a fresh key per enforcement epoch (e.g.
    * date-stamped), exactly like any other scheduled maintenance.
    */
  def writeSweepKeys(stageDir: String, keys: Set[String]): Unit = {
    require(keys.forall(k => k.nonEmpty && !k.contains("\n") && !k.contains("\r")),
      "sweep keys must be non-empty single lines")
    Files.write(Paths.get(stageDir, SweepKeysFile),
      keys.toSeq.sorted.mkString("", "\n", "\n").getBytes(UTF_8))
  }

  /** The committed generation's applied-sweep set ([[readBuildKey]]
    * failure posture: unreadable/absent = empty = "cannot prove, re-run
    * the sweep" — the sweep itself is idempotent, so the worst outcome
    * is one redundant rewrite).
    */
  def readSweepKeys(genDir: String): Set[String] = {
    val p = Paths.get(genDir, SweepKeysFile)
    if (!Files.exists(p)) Set.empty
    else scala.util.Try(new String(Files.readAllBytes(p), UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
  }

  /** Session memo for one-shot mutation waves in registered queries —
    * the [[graft.ops.Ivf.deleteWhereCached]] rationale generalized
    * across families: a bench replay should time the steady-state page,
    * not re-run a rewrite whose effect is already durable on disk. The
    * memo is keyed (path, source fingerprint, sweepKey); a memo MISS
    * whose `sweepKey` is recorded on the live generation (a
    * compaction/deleteWhere that passed it through
    * [[writeSweepKeys]]) reopens for one sidecar read instead of
    * re-running. A body that records no sweep key simply re-runs on a
    * miss — every caller's wave is idempotent (token-guarded mutations,
    * set-union tombstones, content-identical rewrites), so the worst
    * outcome is one redundant pass, never a wrong result.
    */
  private val sweepWaveMemo =
    new BoundedCache[(String, Long, String), Unit](max = 128)

  def sweepOnce(path: String, srcDir: String, sweepKey: String)(
      sweep: => Unit): Unit = {
    val key = (path, Fs.dirFingerprint(srcDir), sweepKey)
    if (sweepWaveMemo.get(key).isEmpty) {
      if (!liveGenOpt(path).exists(g => readSweepKeys(g).contains(sweepKey)))
        sweep
      sweepWaveMemo.putReplacing(key, ())(
        k => k._1 == path && k._3 == sweepKey && k != key)
    }
  }

  // ---- drain watermark (durable one-shot stream drains) ----------------------

  private val DrainKeysFile = "_applied_drains.txt"

  /** The stream-drain compositions already applied to this index ROOT —
    * [[writeSweepKeys]] extended to drains. A drain commits token-guarded
    * segments INTO the live generation rather than replacing it, so its
    * proof lives at the root (like the pin manifests), where it survives
    * later compactions/rebalances. Unreadable/absent = empty = "cannot
    * prove, re-drain" — every drain is token-guarded, so the worst
    * outcome is one redundant no-op drain, never a wrong result.
    */
  def readDrainKeys(root: String): Set[String] = {
    val p = Paths.get(root, DrainKeysFile)
    if (!Files.exists(p)) Set.empty
    else scala.util.Try(new String(Files.readAllBytes(p), UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
  }

  /** Record a COMPLETED drain durably: read-union-write of the root
    * sidecar under the same monitor + lease every mutation takes,
    * committed by tmp + atomic rename like every other sidecar. Called
    * only after the drain body finished — a crash mid-drain leaves no
    * record and the next attempt re-runs the idempotent drain.
    */
  def recordDrainKey(root: String, key: String): Unit = {
    requireValidToken(key)
    lockFor(root).synchronized {
      withLease(root, op = "drain-record") {
        val keys = readDrainKeys(root) + key
        val tmp = Paths.get(root, DrainKeysFile + ".tmp")
        Files.write(tmp,
          keys.toSeq.sorted.mkString("", "\n", "\n").getBytes(UTF_8))
        Files.move(tmp, Paths.get(root, DrainKeysFile),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private val drainMemo = new BoundedCache[(String, String), Unit](max = 128)

  /** One-shot stream drain with a DURABLE watermark — the sweepOnce
    * idea with the disk proof made unconditional: the session memo is
    * only a fast path, and a memo MISS consults the root's
    * applied-drains sidecar, so the skip decision is always provable
    * from disk. A fresh JVM honors a completed drain; a crash mid-drain
    * left no record and re-runs the token-guarded (hence idempotent)
    * drain. The fingerprints of EVERY source directory the drain
    * consumes fold into the recorded key, so an in-place rewrite of any
    * of them invalidates the watermark (a composed drain over two
    * indexes keys on both corpora — neither side can serve stale).
    */
  def drainOnce(root: String, srcDirs: Seq[String], drainKey: String)(
      drain: => Unit): Unit = {
    val full = s"$drainKey|fp=${srcDirs.map(Fs.dirFingerprint).mkString(",")}"
    val memoKey = (root, full)
    if (drainMemo.get(memoKey).isEmpty) {
      if (!readDrainKeys(root).contains(full)) {
        drain
        recordDrainKey(root, full)
      }
      drainMemo.putReplacing(memoKey, ())(k => k._1 == root && k != memoKey)
    }
  }

  /** Test hook: forget the in-JVM drain memo so specs can prove the
    * DISK watermark alone carries the skip decision (the fresh-JVM
    * contract, exercised without a second JVM).
    */
  private[graft] def resetDrainMemoForTest(): Unit =
    drainMemo.evict(_ => true)

  /** Carry both derivation sidecars (build key + applied sweeps) from
    * the live generation into a staged successor — the one call every
    * content-preserving generation-replacing commit makes.
    */
  def carryDerivationKeys(gen: String, stage: String): Unit = {
    carryBuildKey(gen, stage)
    val sweeps = readSweepKeys(gen)
    if (sweeps.nonEmpty) writeSweepKeys(stage, sweeps)
  }

  /** The generation's committed segment values — what the `seg`
    * partition column reads as (`seg=base` → "base"). Bounded: one per
    * commit unit, collapsed by compaction.
    */
  def segmentValues(genDir: String): Seq[String] = {
    val g = Paths.get(genDir)
    if (!Files.isDirectory(g)) Nil
    else {
      val s = Files.list(g)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg="))
          .map(_.stripPrefix("seg=")).toSeq.sorted
      } finally s.close()
    }
  }

  // ---- fsck (structural health check) ----------------------------------------

  /** Protocol-level health check of an index root — the read-only fsck
    * an operator runs after an incident (crashed writer, restored
    * backup, suspected foreign interference) BEFORE trusting the index
    * again. Returns human-readable violations (empty = healthy).
    * Checks exactly the invariants the commit protocol maintains, so a
    * violation means the protocol was bypassed (a hand-edited
    * directory, a partial restore), not that a crash occurred — every
    * crash state the protocol can produce is either invisible
    * (stages), reapable (orphan generations) or self-healing (sidecar
    * tmp files), and those are reported as NOTEs, not violations.
    * Data-level invariants (duplicate ids, sidecar arithmetic) are the
    * families' [[graft.ops.IndexFamily.fsckIndex]] layer on top.
    */
  def fsckRoot(root: String): (Seq[String], Seq[String]) =
    fsckRootResolved(root)._1

  /** [[fsckRoot]] plus the generation it audited — the data layer reads
    * the SAME generation, so the whole fsck observes one snapshot (and,
    * per the reader contract, survives one subsequent commit).
    */
  def fsckRootResolved(root: String): ((Seq[String], Seq[String]), Option[String]) = {
    val bad = Seq.newBuilder[String]
    val note = Seq.newBuilder[String]
    val genOpt = liveGenOpt(root)
    genOpt match {
      case None =>
        bad += (if (Files.exists(Paths.get(root, LivePointer)))
          s"live pointer names a missing generation directory"
        else s"no live pointer — the index was never committed (or the pointer was deleted)")
      case Some(gen) =>
        val genName = Paths.get(gen).getFileName.toString
        // ONE pass over the pin manifests serves every pin-related
        // claim: the retained note, the per-label audit (a manifest
        // naming a missing generation means a reap path ignored the pin
        // set; an unparseable one is a finding, never an fsck crash),
        // AND the healthy pins' generation set for the count below — a
        // corrupt manifest must not strip HEALTHY pins' generations
        // from the exemption and turn them into a spurious
        // "non-live generations" violation
        var anyCorruptPin = false
        val pinnedGens = listSnapshotLabels(root).flatMap { label =>
          try {
            val snapOpt = readSnapshot(root, label)
            snapOpt.foreach { snap =>
              if (!Files.isDirectory(Paths.get(root, snap.gen)))
                bad += s"pin '$label' references missing generation " +
                  s"${snap.gen} — a reap path ignored the pin set"
            }
            snapOpt.map(_.gen)
          } catch {
            case e: Exception =>
              anyCorruptPin = true
              bad += s"pin manifest '$label' unparseable " +
                s"(${e.getClass.getSimpleName}) — not written by this protocol"
              None
          }
        }.toSet
        if (pinnedGens.nonEmpty)
          note += s"${pinnedGens.size} pinned snapshot generation(s) " +
            s"retained: ${pinnedGens.toSeq.sorted.mkString(", ")}"
        if (anyCorruptPin)
          note += "generation reaping is FROZEN while a pin manifest is " +
            "unparseable (unpin or restore it to resume)"
        // a crash inside pinLive leaves <label>.txt.tmp in _pins —
        // invisible to every reader (labels match .txt only), reclaimed
        // by fsckRepair's tmp sweep
        val pinTmps = {
          val pd = Paths.get(root, PinsDir)
          if (!Files.isDirectory(pd)) Nil
          else {
            val s = Files.list(pd)
            try {
              import scala.jdk.CollectionConverters._
              s.iterator().asScala.map(_.getFileName.toString)
                .filter(_.endsWith(".txt.tmp")).toList
            } finally s.close()
          }
        }
        if (pinTmps.nonEmpty)
          note += s"torn pin-manifest tmp file(s) in $PinsDir (crashed " +
            s"pinLive; reclaimed by fsckRepair): ${pinTmps.mkString(", ")}"
        val others = genDirs(root).map(_._2.getFileName.toString)
          .filterNot(_ == genName).filterNot(pinnedGens.contains)
        if (others.size > 1)
          bad += s"${others.size} non-live generations (protocol keeps ONE predecessor): ${others.mkString(", ")}"
        else if (others.size == 1)
          note += s"predecessor generation ${others.head} present (reclaimed at the next commit)"
        val r = Paths.get(root)
        val stages = {
          val s = Files.list(r)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.map(_.getFileName.toString)
              .filter(_.startsWith(".stage-")).toSeq
          } finally s.close()
        }
        if (stages.nonEmpty)
          note += s"${stages.size} crashed staging dir(s) (invisible to readers; reaped by the next mutation)"
        // segments: every token-committed segment carries its token;
        // tokens unique across segments and the consolidated sidecar
        // (token segments are b<md5-16>; "base" also starts with 'b')
        val tokenSeg = "^b[0-9a-f]{16}$".r
        val segs = segmentValues(gen)
        val tokenless = segs.filter(s => tokenSeg.matches(s) &&
          !Files.exists(Paths.get(gen, s"seg=$s", TokenFile)))
        if (tokenless.nonEmpty)
          bad += s"token-committed segment(s) missing _token.txt: ${tokenless.map("seg=" + _).mkString(", ")}"
        val segTokens = segs.flatMap { s =>
          val t = Paths.get(gen, s"seg=$s", TokenFile)
          if (Files.exists(t)) Some(new String(Files.readAllBytes(t), UTF_8).trim)
          else None
        }
        // duplicates across segment token files AND the consolidated
        // carried-token sidecar: a token appearing in both means the
        // batch's rows exist twice (compacted into base AND as a
        // restored segment)
        val consolidated = {
          val p = Paths.get(gen, ConsolidatedTokens)
          if (!Files.exists(p)) Seq.empty[String]
          else new String(Files.readAllBytes(p), UTF_8)
            .split("\n").toSeq.filter(_.nonEmpty)
        }
        val dupTokens = (segTokens ++ consolidated).groupBy(identity)
          .collect { case (t, v) if v.size > 1 => t }
        if (dupTokens.nonEmpty)
          bad += s"duplicate applied token(s) across segments/consolidated sidecar: ${dupTokens.mkString(", ")}"
        // tombstones: pairs must parse, reference committed segments,
        // and respect the bounded-metadata cap. A sidecar the audit
        // itself cannot parse IS the finding, never an fsck crash.
        try {
          val tombs = readTombstones(gen)
          val segSet = segs.toSet
          val orphanTombs = tombs.map(_._1).distinct.filterNot(segSet.contains)
          if (orphanTombs.nonEmpty)
            bad += s"tombstone pairs reference missing segment(s): ${orphanTombs.mkString(", ")}"
          if (tombs.length > tombstonePairCap)
            bad += s"tombstone sidecar over the bounded-metadata cap (${tombs.length} > $tombstonePairCap)"
        } catch {
          case e: Exception =>
            bad += s"tombstone sidecar unparseable (${e.getClass.getSimpleName}) — not written by this protocol"
        }
        // torn sidecar writes leave only .tmp files — self-healing
        // (next atomic replace), but worth a note
        val tmps = {
          val s = Files.list(Paths.get(gen))
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.map(_.getFileName.toString)
              .filter(_.endsWith(".tmp")).toSeq
          } finally s.close()
        }
        if (tmps.nonEmpty)
          note += s"leftover sidecar tmp file(s) (overwritten by the next atomic replace): ${tmps.mkString(", ")}"
    }
    ((bad.result(), note.result()), genOpt)
  }

  /** fsck --repair: reclaim the crash debris [[fsckRoot]] reports,
    * under the SAME mutation lease every writer takes, so a repair can
    * never race a commit. Strictly bounded to states the protocol
    * itself produces and proves unreferenced:
    *
    *  - staging dirs (`.stage-*`) — invisible to readers by
    *    construction, abandoned by a crash before commit;
    *  - generation dirs that are neither live nor the single
    *    highest-numbered predecessor (the reader-grace copy the commit
    *    protocol itself retains) — crash-orphans newer than live were
    *    moved but never pointed to, over-retained older ones are past
    *    their grace window;
    *  - torn sidecar `*.tmp` files in the live generation — already
    *    self-healing (the next atomic replace overwrites), reclaimed
    *    here for tidiness.
    *
    * VIOLATIONS (protocol bypassed: missing tokens, duplicate tokens,
    * orphan tombstones) are NOT repaired — a safe resolution cannot be
    * derived from the wreckage, so they stay loud in [[fsckRoot]].
    * Returns the reclaimed entries, category-prefixed.
    */
  def fsckRepair(root: String): Seq[String] = lockFor(root).synchronized {
   // monitor → lease like every mutation, but NOT [[withMutation]]:
   // that wrapper reaps stages before its body runs, and a repair must
   // OBSERVE the debris to report what it reclaimed
   withLease(root, op = "fsck-repair") {
    import scala.jdk.CollectionConverters._
    val reclaimed = Seq.newBuilder[String]
    val r = Paths.get(root)
    if (Files.isDirectory(r)) {
      val names = {
        val s = Files.list(r)
        try s.iterator().asScala.map(_.getFileName.toString).toList
        finally s.close()
      }
      names.filter(_.startsWith(".stage-")).foreach { n =>
        Fs.deleteRecursively(r.resolve(n).toString)
        reclaimed += s"stage:$n"
      }
      liveGenOpt(root).foreach { gen =>
        val liveName = Paths.get(gen).getFileName.toString
        val liveNum = genNumber(liveName)
        // an unparseable pin manifest freezes GENERATION reaping only:
        // the damaged pin's generation is unknowable, and repair must
        // not delete what might be a pinned snapshot's only copy. The
        // sidecar tmp reclamation below stays outside the freeze — a
        // *.tmp is torn-write debris, never pinnable data.
        pinnedGenNames(root).foreach { pinned =>
          val others = genDirs(root)
            .filterNot(_._2.getFileName.toString == liveName)
            .filterNot(g => pinned.contains(g._2.getFileName.toString))
          // which older generation is the reader-grace predecessor? The
          // commit records the VALIDATED (live, prev) pair — NUMBER
          // ordering cannot tell it apart from a crash-orphan that was
          // moved but never pointed to, and guessing wrong reaps the
          // copy a reader still holds. Newer-than-live generations are
          // always orphan debris (the pointer flip is the commit);
          // older ones are reaped only against the recorded
          // predecessor — a pre-sidecar root, or a record left stale by
          // a crash around the pointer flip, keeps them all rather
          // than guess.
          val recordedPrev = prevGenName(root, liveName)
          others.foreach { case (num, p) =>
            val n = p.getFileName.toString
            val newerThanLive = liveNum.exists(num > _)
            val reapOlder = recordedPrev.exists(prev => !prev.contains(n))
            if (newerThanLive || (liveNum.exists(num < _) && reapOlder)) {
              Fs.deleteRecursively(p.toString)
              reclaimed += s"gen:$n"
            }
          }
        }
        val tmps = {
          val s = Files.list(Paths.get(gen))
          try s.iterator().asScala
            .filter(p => Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".tmp"))
            .map(_.getFileName.toString).toList
          finally s.close()
        }
        tmps.foreach { n =>
          Files.deleteIfExists(Paths.get(gen, n))
          reclaimed += s"tmp:$n"
        }
      }
      // a crash inside pinLive leaves _pins/<label>.txt.tmp behind —
      // never a valid manifest (listSnapshotLabels only matches .txt),
      // so it is torn-write debris like any other sidecar tmp
      val pins = r.resolve(PinsDir)
      if (Files.isDirectory(pins)) {
        val ptmps = {
          val s = Files.list(pins)
          try s.iterator().asScala
            .filter(p => Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".txt.tmp"))
            .map(_.getFileName.toString).toList
          finally s.close()
        }
        ptmps.foreach { n =>
          Files.deleteIfExists(pins.resolve(n))
          reclaimed += s"pintmp:$n"
        }
      }
    }
    reclaimed.result()
   }
  }

  // ---- pinned snapshots (as-of reads) ----------------------------------------
  //
  // A pin is a MANIFEST, not a generation name: append/upsert/CDC
  // commit segments INTO the live generation and deletes grow its
  // tombstone sidecar in place, so "the index as the pin saw it" is
  // (generation, the segment set present then, the tombstone pairs
  // recorded then) — the Iceberg snapshot model re-expressed on this
  // protocol. In-place mutations only ADD (segments, tombstone pairs),
  // never rewrite inside a generation, so the manifest filters the
  // grown directory back to the pinned view exactly; REWRITE mutations
  // (compaction, retention, rebuild) commit a NEW generation, and the
  // pinned one survives reaping because every reap path skips pinned
  // names. Family-specific sidecar state a snapshot read needs (e.g.
  // the lexical removed-stats adjustment) rides the manifest as opaque
  // `x-` entries the family supplies at pin time.

  private val PinsDir = "_pins"

  final case class Snapshot(gen: String, segs: Seq[String],
      tombs: Array[(String, Long)], extra: Map[String, String],
      createdMs: Long = 0L)

  /** The labels with a pin manifest on disk, sorted. */
  def listSnapshotLabels(root: String): Seq[String] = {
    val d = Paths.get(root, PinsDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".txt"))
        .map(_.stripSuffix(".txt")).toList.sorted
      finally s.close()
    }
  }

  /** Generation names any pin manifest references — every reap path
    * (commit, repair) must keep these on disk. None when ANY manifest
    * is unparseable: the damaged pin's generation is unknowable, so
    * reap paths must freeze generation reaping entirely (data first —
    * fsck names the manifest; repair or unpin resolves it) rather than
    * delete what might be a pinned snapshot's only copy.
    */
  def pinnedGenNames(root: String): Option[Set[String]] = {
    val resolved = listSnapshotLabels(root).map { l =>
      try Some(readSnapshot(root, l).map(_.gen))
      catch { case _: Exception => None }
    }
    if (resolved.exists(_.isEmpty)) None
    else Some(resolved.flatMap(_.flatten).toSet)
  }

  private def requireValidLabel(label: String): Unit = {
    requireValidToken(label)
    require(!label.contains("/") && !label.contains(","),
      s"pin label must be a plain name: '$label'")
  }

  /** Resolve the live state into a manifest and write it — callers hold
    * the monitor + lease and have already decided the label is free.
    */
  private def writePin(root: String, label: String,
      extra: String => Map[String, String],
      createdMs: Long = System.currentTimeMillis()): Snapshot = {
    val gen = liveGen(root)
    val snap = Snapshot(Paths.get(gen).getFileName.toString,
      segmentValues(gen), readTombstones(gen), extra(gen), createdMs)
    val d = Paths.get(root, PinsDir)
    Files.createDirectories(d)
    val body = (Seq(s"gen=${snap.gen}", s"created=${snap.createdMs}") ++
      snap.segs.map(s => s"seg=$s") ++
      snap.tombs.map { case (s, id) => s"tomb=$s,$id" } ++
      snap.extra.toSeq.sortBy(_._1).map { case (k, v) =>
        require(k.startsWith("x-"), s"extra keys must be x-*: $k")
        s"$k=$v"
      }).mkString("", "\n", "\n")
    val tmp = d.resolve(s"$label.txt.tmp")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, d.resolve(s"$label.txt"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Pin the LIVE state under `label`: record the generation, its
    * current segment set and tombstone pairs, plus the family's `extra`
    * sidecar values (computed against the resolved generation, under
    * the same lease — one snapshot, no torn view). A label is immutable
    * until [[unpin]]: pinning an EXISTING label refuses loudly naming
    * the pin it would have silently shadowed — a caller who believes
    * they re-pinned "nightly" at today's state must not get
    * yesterday's. A replay-safe pipeline that WANTS first-pin-wins
    * semantics says so with [[pinLiveIfAbsent]]; deliberately moving a
    * label is [[repin]].
    */
  def pinLive(root: String, label: String,
      extra: String => Map[String, String] = _ => Map.empty): Snapshot =
    lockFor(root).synchronized {
      requireValidLabel(label)
      withLease(root, op = s"pin($label)") {
        readSnapshot(root, label).foreach { existing =>
          throw new IllegalStateException(
            s"pin '$label' already exists on $root (generation " +
              s"${existing.gen}) — pinning again would silently keep the " +
              "OLD snapshot. Use repin to move the label to the live " +
              "state, unpin first, or pinLiveIfAbsent for replay-safe " +
              "first-pin-wins semantics.")
        }
        writePin(root, label, extra)
      }
    }

  /** First-pin-wins: pin the live state, or return the EXISTING
    * manifest unchanged when the label is already pinned — the replay
    * contract idempotent pipelines rely on (a re-run keeps its first
    * snapshot; it never re-resolves).
    */
  def pinLiveIfAbsent(root: String, label: String,
      extra: String => Map[String, String] = _ => Map.empty): Snapshot =
    lockFor(root).synchronized {
      requireValidLabel(label)
      withLease(root, op = s"pin($label)") {
        readSnapshot(root, label).getOrElse(writePin(root, label, extra))
      }
    }

  /** Deliberately move `label` to the CURRENT live state under ONE
    * lease (drop + re-resolve + write, no window for a half-pinned
    * observer). The explicit verb for the "re-pin nightly" intent
    * [[pinLive]] refuses to guess at. The previously pinned generation
    * becomes reclaimable at the next commit, like [[unpin]].
    */
  def repin(root: String, label: String,
      extra: String => Map[String, String] = _ => Map.empty): Snapshot =
    lockFor(root).synchronized {
      requireValidLabel(label)
      withLease(root, op = s"repin($label)") {
        // NO delete-then-write: writePin commits via tmp + ATOMIC_MOVE +
        // REPLACE_EXISTING, so the label atomically jumps old→new — a
        // crash mid-repin must never leave the label pinned NOWHERE
        // (the old generation would lose its only reap protection)
        writePin(root, label, extra)
      }
    }

  /** Pin TWO index roots under ONE label atomically with respect to
    * mutations: both mutation leases are taken (path-ordered, the
    * datacardClone idiom, so two concurrent pinPairs cannot deadlock)
    * BEFORE either manifest resolves — no CDC/upsert/compaction wave
    * can land between the two pins, which is exactly the skew
    * [[graft.ops.LexIndex.hybridPageAsOf]]-style cross-index readers
    * would otherwise silently inherit. Refuses (before writing
    * anything) when the label exists on exactly ONE root: that is the
    * torn state of a crashed earlier pinPair, and completing it now
    * would pin the other side at a LATER state — the skew this verb
    * exists to prevent; unpin the survivor and retry. When the label
    * exists on BOTH, returns the existing pair (a replayed pipeline
    * keeps its first snapshot — the pair was written under one barrier,
    * so it is consistent).
    */
  def pinPair(rootA: String, rootB: String, label: String,
      extraA: String => Map[String, String] = _ => Map.empty,
      extraB: String => Map[String, String] = _ => Map.empty): (Snapshot, Snapshot) = {
    requireValidLabel(label)
    require(rootA != rootB, s"pinPair: the two roots are the same path ($rootA)")
    val (first, second) = if (rootA <= rootB) (rootA, rootB) else (rootB, rootA)
    lockFor(first).synchronized { lockFor(second).synchronized {
      withLease(first, op = s"pinPair($label)") {
        withLease(second, op = s"pinPair($label)") {
          val ea = readSnapshot(rootA, label)
          val eb = readSnapshot(rootB, label)
          (ea, eb) match {
            case (Some(a), Some(b)) => (a, b)
            case (None, None) =>
              // ONE timestamp for both manifests: a TTL sweep must see
              // the pair expire together — two clock reads would open
              // an age window where unpinExpired reaps exactly one half
              val now = System.currentTimeMillis()
              (writePin(rootA, label, extraA, now),
                writePin(rootB, label, extraB, now))
            case _ =>
              val (has, lacks) = if (ea.isDefined) (rootA, rootB) else (rootB, rootA)
              throw new IllegalStateException(
                s"pinPair '$label': $has is pinned but $lacks is not — a " +
                  "crashed earlier pinPair left a torn pair, and completing " +
                  "it now would pin the two sides at DIFFERENT states. " +
                  s"unpin '$label' on $has, then retry.")
          }
        }
      }
    } }
  }

  /** Per-pin retention accounting — the operator surface for "what is
    * each pin costing me, and how old is it". `retainedBytes` is
    * hard-link-aware: bytes of the pinned generation's files whose
    * inode does NOT also appear in the live generation (a tiered merge
    * carries untouched segments by link, so naive directory sizes
    * would double-count shared bytes as retention). `ageMs` is -1 for
    * manifests written before the `created` line existed.
    *
    * Runbook: pins are free at pin time and cost retention forever —
    * each keeps its whole generation through every later rewrite.
    * Operators should either [[unpin]] when the consumer (an eval, an
    * audit) finishes, enforce a TTL with [[unpinExpired]], or enforce a
    * storage budget with [[unpinByBudget]]; the freed generation is
    * reclaimed by the NEXT commit or fsckRepair.
    */
  final case class PinStat(label: String, gen: String, ageMs: Long,
      retainedBytes: Long)

  /** (inode, size) of every regular file under `dir` — the raw walk
    * behind every hard-link-aware retention computation ([[pinStats]],
    * [[unpinByBudget]]). The same inode can appear more than once (two
    * links inside one generation); consumers dedup by inode.
    */
  private def inodesAndBytes(dir: Path): Seq[(Object, Long)] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(dir)) Nil
    else {
      val w = Files.walk(dir)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => (Files.getAttribute(p, "unix:ino"), Files.size(p)))
        .toList
      finally w.close()
    }
  }

  def pinStats(root: String): Seq[PinStat] = {
    // resolve the live generation ONCE: the name compared per label and
    // the inode set subtracted from retention must describe the SAME
    // live state — a commit landing between two resolves would report a
    // fully-retained generation as free (the exact signal the
    // unpin-or-TTL runbook reads). A walk racing a concurrent commit
    // degrades to the conservative answer (shared bytes counted as
    // retained), never an abort of the whole report.
    val live = liveGenOpt(root)
    val liveName = live.map(g => Paths.get(g).getFileName.toString)
    val liveInodes =
      try live.map(g => inodesAndBytes(Paths.get(g)).map(_._1).toSet)
        .getOrElse(Set.empty[Object])
      catch { case _: Exception => Set.empty[Object] }
    val now = System.currentTimeMillis()
    listSnapshotLabels(root).map { label =>
      try {
        val snap = readSnapshot(root, label).get
        val genDir = Paths.get(root, snap.gen)
        val retained =
          if (liveName.contains(snap.gen)) 0L
          else inodesAndBytes(genDir)
            .collect { case (ino, sz) if !liveInodes.contains(ino) => sz }.sum
        PinStat(label, snap.gen,
          if (snap.createdMs > 0) now - snap.createdMs else -1L, retained)
      } catch {
        case _: Exception => PinStat(label, "<unparseable>", -1L, -1L)
      }
    }
  }

  def readSnapshot(root: String, label: String): Option[Snapshot] = {
    val p = Paths.get(root, PinsDir, s"$label.txt")
    if (!Files.exists(p)) None
    else {
      val lines = new String(Files.readAllBytes(p), UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
      val kv = lines.map { l =>
        val i = l.indexOf('=')
        // a raw StringIndexOutOfBounds here surfaced a cryptic error on
        // the SERVING paths (bm25TopKAsOf, screenBatchAsOf) — name the
        // unparseable manifest instead, matching the missing-gen-line
        // error (fsck/pinnedGenNames catch this and freeze reaping)
        if (i < 0) throw new IllegalStateException(
          s"pin manifest $p has a line without '=': '$l' — not written " +
            "by this protocol")
        (l.substring(0, i), l.substring(i + 1))
      }
      Some(Snapshot(
        kv.collectFirst { case ("gen", v) => v }.getOrElse(
          throw new IllegalStateException(s"pin manifest $p has no gen line")),
        kv.collect { case ("seg", v) => v },
        kv.collect { case ("tomb", v) =>
          val i = v.lastIndexOf(',')
          (v.substring(0, i), v.substring(i + 1).toLong)
        }.toArray,
        kv.collect { case (k, v) if k.startsWith("x-") => k -> v }.toMap,
        // pre-`created` manifests read as 0 — pinStats reports their
        // age as unknown rather than guessing
        kv.collectFirst { case ("created", v) => v.toLong }.getOrElse(0L)))
    }
  }

  /** Drop the pin; the generation it protected is reclaimed by the
    * NEXT commit or [[fsckRepair]] (never here — unpin is metadata
    * only). Returns whether the label existed.
    */
  def unpin(root: String, label: String): Boolean =
    lockFor(root).synchronized {
      withLease(root, op = s"unpin($label)") {
        Files.deleteIfExists(Paths.get(root, PinsDir, s"$label.txt"))
      }
    }

  /** The pin-TTL runbook as one verb: unpin every label on `root`
    * whose manifest age exceeds `ttlMs`, under ONE lease so the sweep
    * observes one consistent pin set. Returns
    * `(unpinned, kept, skipped)` labels — `skipped` are manifests
    * whose age CANNOT be proven (written before the `created` line, or
    * unparseable): an unprovable age must never reap a pin someone may
    * still be serving from, so those are reported for a human instead.
    * Like [[unpin]], this is metadata-only; the freed generations are
    * reclaimed by the next commit or [[fsckRepair]].
    *
    * [[pinPair]] labels: sweep BOTH roots of every hybrid pair through
    * the MULTI-ROOT overload, which decides every expiry against ONE
    * clock read — the pair's manifests share one created stamp, so one
    * `now` expires both sides or neither. Two single-root sweeps read
    * the clock twice, and a pair whose age crosses the TTL between the
    * two calls would be torn — the state [[pinPair]] refuses on retry
    * until the survivor is unpinned.
    */
  def unpinExpired(root: String, ttlMs: Long): (Seq[String], Seq[String], Seq[String]) =
    unpinExpired(Seq(root), ttlMs)

  /** Hold every root's in-JVM monitor and cross-process lease at once,
    * acquired in PATH ORDER (the pinPair idiom generalized to N roots,
    * so two concurrent multi-root sweeps cannot deadlock) — the barrier
    * under which a multi-root pin sweep decides AND applies, so a lease
    * timeout or refusal on any root throws BEFORE the first label is
    * deleted, never between two halves of a pair. Caller passes the
    * roots as given; duplicates are collapsed.
    */
  private def withRootsLocked[A](roots: Seq[String], op: String)(f: => A): A = {
    def go(rs: List[String]): A = rs match {
      case Nil => f
      case h :: t => lockFor(h).synchronized {
        withLease(h, op = op)(go(t))
      }
    }
    go(roots.distinct.sorted.toList)
  }

  /** [[unpinExpired]] over several roots with ONE `now` for every
    * expiry decision — the pair-safe sweep (see the single-root form's
    * contract). ALL roots' monitors + leases are taken path-ordered
    * BEFORE the first delete, so a lease timeout on a later root
    * refuses the whole sweep instead of tearing a pair whose first half
    * was already unpinned. (A crash — JVM death — between two deletes
    * can still tear a pair; re-running the sweep heals it: the
    * survivor's shared created stamp still exceeds the TTL, so the
    * retry unpins it and pinPair stops refusing.) Results are
    * concatenated across roots in order.
    */
  def unpinExpired(roots: Seq[String], ttlMs: Long): (Seq[String], Seq[String], Seq[String]) = {
    require(ttlMs >= 0, s"unpinExpired: ttlMs must be >= 0, got $ttlMs")
    require(roots.nonEmpty, "unpinExpired: no roots given")
    val now = System.currentTimeMillis()
    val swept = withRootsLocked(roots, s"unpinExpired(${ttlMs}ms)") {
      val scanned = roots.map { root =>
        val (known, skipped) = listSnapshotLabels(root).partitionMap { label =>
          try {
            val created = readSnapshot(root, label).get.createdMs
            if (created > 0) Left(label -> (now - created)) else Right(label)
          } catch { case _: Exception => Right(label) }
        }
        (root, known, skipped)
      }
      // a label unreadable on ANY root taints its whole group: expiring
      // only the readable side of a pinPair would manufacture a torn
      // pair no retry can heal (the unreadable side never expires)
      val tainted = scanned.flatMap(_._3).toSet
      scanned.map { case (root, known, skipped) =>
        val (clean, held) = known.partition { case (l, _) => !tainted(l) }
        val (expired, kept) = clean.partition(_._2 > ttlMs)
        expired.foreach { case (label, _) =>
          Files.deleteIfExists(Paths.get(root, PinsDir, s"$label.txt")); ()
        }
        (expired.map(_._1), kept.map(_._1), skipped ++ held.map(_._1))
      }
    }
    (swept.flatMap(_._1), swept.flatMap(_._2), swept.flatMap(_._3))
  }

  /** The pin-retention BYTE-BUDGET dial — what an operator with a
    * storage budget actually sets, complementing [[unpinExpired]]'s
    * age dial: unpin labels OLDEST-FIRST until the total retained bytes
    * across `roots` (the [[pinStats]] hard-link-aware accounting) fit
    * under `maxRetainedBytes`. Rules, each load-bearing:
    *
    *  - a label present on SEVERAL roots is one GROUP (the pinPair
    *    shape): it is unpinned on all of them together or not at all —
    *    the same all-roots-locked barrier as [[unpinExpired]], so no
    *    live interleaving can tear a pair; and a group with ANY
    *    unreadable member is skipped WHOLE — reaping only the readable
    *    sides of a pair would manufacture the torn state this sweep
    *    exists to avoid;
    *  - accounting is by inode SET, not per-pin sums: two pins can
    *    share bytes by hard link (a tiered merge carries untouched
    *    segments across generations), so total retention is the bytes
    *    of the UNION of all pinned generations' non-live inodes, and a
    *    reap is only credited the bytes no surviving pin still links —
    *    the sweep cannot stop early believing bytes freed that are
    *    still on disk;
    *  - zero-retention pins are never reaped: a pin of the LIVE
    *    generation retains nothing (its bytes serve anyway), so
    *    unpinning it frees no budget and only loses the label — the
    *    live generation is structurally never reclaimed here;
    *  - unknown ages (pre-`created` manifests) and unparseable
    *    manifests are SKIPPED and reported, the [[unpinExpired]]
    *    contract: an unprovable age must never reap a pin someone may
    *    serve from.
    *
    * Returns `(unpinned, kept, skipped)` as (root, label) pairs.
    * Metadata-only, like every unpin: freed generations are reclaimed
    * by each root's next commit or [[fsckRepair]].
    */
  def unpinByBudget(roots: Seq[String], maxRetainedBytes: Long):
      (Seq[(String, String)], Seq[(String, String)], Seq[(String, String)]) = {
    require(maxRetainedBytes >= 0,
      s"unpinByBudget: maxRetainedBytes must be >= 0, got $maxRetainedBytes")
    require(roots.nonEmpty, "unpinByBudget: no roots given")
    final case class Entry(root: String, label: String, ageMs: Long,
        inodes: Map[Object, Long])
    withRootsLocked(roots, s"unpinByBudget(${maxRetainedBytes}B)") {
      val now = System.currentTimeMillis()
      val (entries0, skipped0) = roots.distinct.flatMap { root =>
        val live = liveGenOpt(root)
        val liveName = live.map(g => Paths.get(g).getFileName.toString)
        val liveInodes =
          try live.map(g => inodesAndBytes(Paths.get(g)).map(_._1).toSet)
            .getOrElse(Set.empty[Object])
          catch { case _: Exception => Set.empty[Object] }
        listSnapshotLabels(root).map { label =>
          try {
            val snap = readSnapshot(root, label).get
            if (snap.createdMs <= 0) Right(root -> label)
            else {
              val m =
                if (liveName.contains(snap.gen)) Map.empty[Object, Long]
                else inodesAndBytes(Paths.get(root, snap.gen))
                  .filterNot { case (ino, _) => liveInodes.contains(ino) }
                  .toMap
              Left(Entry(root, label, now - snap.createdMs, m))
            }
          } catch { case _: Exception => Right(root -> label) }
        }
      }.partitionMap(identity)
      val tainted = skipped0.map(_._2).toSet
      val (known, alsoSkipped) = entries0.partition(e => !tainted(e.label))
      val skipped = skipped0 ++ alsoSkipped.map(e => e.root -> e.label)
      // one group per label, oldest-first; age is the group's max
      var groups = known.groupBy(_.label).map { case (label, es) =>
        (label, es, es.map(_.ageMs).max)
      }.toSeq.sortBy { case (label, _, age) => (-age, label) }
      def unionBytes(gs: Seq[(String, Seq[Entry], Long)]): Long =
        gs.flatMap(_._2.flatMap(_.inodes))
          .groupMapReduce(_._1)(_._2)((a, _) => a).values.sum
      val unpinned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done && unionBytes(groups) > maxRetainedBytes) {
        // oldest group whose reap actually FREES bytes: an inode some
        // other surviving group still links frees nothing yet (it may
        // after that group is reaped — the recompute sees it then).
        // When NO group frees alone — e.g. two labels pinning the SAME
        // generation, the common case since in-place appends keep the
        // generation name — fall back to the oldest byte-holding group:
        // each reap strictly shrinks the holder set, so the last holder
        // eventually frees and the recompute credits it then.
        def holdsBytes(es: Seq[Entry]): Boolean =
          es.flatMap(_.inodes).exists(_._2 > 0)
        val pick = groups.zipWithIndex.find { case ((_, es, _), i) =>
          val others = groups.patch(i, Nil, 1)
            .flatMap(_._2.flatMap(_.inodes.keys)).toSet
          es.flatMap(_.inodes).exists { case (ino, sz) => sz > 0 && !others(ino) }
        }.orElse(groups.zipWithIndex.find { case ((_, es, _), _) => holdsBytes(es) })
        pick match {
          case Some(((label, es, _), i)) =>
            es.foreach { e =>
              Files.deleteIfExists(Paths.get(e.root, PinsDir, s"$label.txt")); ()
            }
            unpinned ++= es.map(e => e.root -> e.label)
            groups = groups.patch(i, Nil, 1)
          case None => done = true
        }
      }
      (unpinned.toSeq, groups.flatMap(_._2).map(e => e.root -> e.label), skipped)
    }
  }

  /** The ONE manifest-view read every family's as-of path serves from:
    * the pinned generation's files restricted to the manifest's segment
    * set, minus its tombstone-pair copy. Kept here so a future fix to
    * either filter reaches all four families at once.
    */
  def snapshotView(spark: org.apache.spark.sql.SparkSession, genDir: String,
      snap: Snapshot, idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    minusTombstonePairs(
      spark.read.parquet(genDir).filter(col("seg").isin(snap.segs: _*)),
      snap.tombs, idCol)
  }

  /** The pinned generation's directory — loud when the manifest exists
    * but the directory was lost (a reap path that ignored pins IS the
    * bug this names).
    */
  def snapshotGenDir(root: String, snap: Snapshot): String = {
    val p = Paths.get(root, snap.gen)
    require(Files.isDirectory(p),
      s"pinned generation ${snap.gen} missing under $root — a reap path " +
        "ignored the pin set")
    p.toString
  }

  /** Materialize the snapshot pinned as `label` into `destRoot` as a
    * brand-new STANDALONE index (generation 0 of its own root, own
    * lease, own lifecycle) — the "ship the frozen eval corpus" verb:
    * the exported root serves exactly the pinned view through plain
    * live reads, can be copied to a release location, mutated, pinned
    * and fsck'd independently, and keeps serving after the source root
    * unpins the label. Files move by hard link (same-filesystem; an
    * object-store deployment copies) — manifest segments land verbatim
    * with their sidecars and token files, the manifest's tombstone-pair
    * COPY becomes the new root's sidecar (pin-time deletes stay
    * subtracted; later ones were never in the manifest), gen-root
    * sidecars carry like a compaction's successor (same derivation:
    * build key + applied sweeps included), and the consolidated token
    * set carries so replaying an already-included batch against the
    * export stays a no-op. `fixup` runs on the stage before the commit
    * — a family rewrites any root sidecar whose LIVE value has advanced
    * past pin time (the lexical removed-stats adjustment).
    *
    * No source lease: the pin protects its generation from every reap
    * path, and in-place mutations only ADD segments/pairs outside the
    * manifest, so the linked view is stable under concurrent writers.
    * The one source-side contract the caller owns is that `label` STAYS
    * PINNED for the duration of the export: a concurrent unpin+commit
    * can reap the pinned generation mid-linkTree (the export then dies
    * loudly mid-stage and its debris is reaped later — never a corrupt
    * commit), so the pin is re-read and compared just before the commit
    * for the clearer error. Refuses a `destRoot` that is already an
    * index root or a non-empty directory — exporting over live data is
    * never recoverable.
    */
  def exportSnapshot(root: String, label: String, destRoot: String,
      fixup: (Snapshot, String) => Unit = (_, _) => ()): String = {
    requireValidLabel(label)
    val snap = readSnapshot(root, label).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot pinned as '$label' under $root"))
    // every occupancy check runs INSIDE the destination's monitor +
    // lease: two concurrent exports to one destRoot must serialize
    // BEFORE deciding it is free, or the loser silently commits a
    // second generation over the winner's
    withMutation(destRoot, op = s"export($label)") {
      exportCore(root, label, snap, destRoot, fixup)
    }
  }

  /** Manifest-view equality — the "did the pin move under us" check.
    * Field-wise because [[Snapshot]] carries an Array (whose case-class
    * equality is reference identity).
    */
  private def sameSnapshot(a: Snapshot, b: Snapshot): Boolean =
    a.gen == b.gen && a.segs == b.segs && a.tombs.toSeq == b.tombs.toSeq &&
      a.extra == b.extra && a.createdMs == b.createdMs

  /** [[exportSnapshot]]'s body, with the destination's monitor + lease
    * already held by the caller ([[withLease]] is not reentrant — a
    * nested take on the same root would self-deadlock until timeout,
    * so [[exportPair]] takes both destinations' leases itself and calls
    * this directly, the [[pinPair]]/`writePin` split).
    */
  private def exportCore(root: String, label: String, snap: Snapshot,
      destRoot: String, fixup: (Snapshot, String) => Unit): String = {
    val genDir = snapshotGenDir(root, snap)
    require(liveGenOpt(destRoot).isEmpty,
      s"exportSnapshot: $destRoot is already an index root (live " +
        "generation present) — refusing to export over it")
    validateExportDebris(destRoot)
    genDirs(destRoot).foreach { case (_, p) =>
      Fs.deleteRecursively(p.toString)
    }
    val stage = newStageDir(destRoot, "export")
    snap.segs.foreach(s => Fs.linkTree(s"$genDir/seg=$s", s"$stage/seg=$s"))
    carryGenRootFiles(genDir, stage)
    writeConsolidatedTokens(stage, consolidatedTokensOf(genDir))
    if (snap.tombs.nonEmpty) stageTombstonePairs(stage, snap.tombs)
    fixup(snap, stage)
    // the label must have stayed pinned while we staged: a concurrent
    // unpin/repin + commit could have reaped or moved the generation we
    // just linked from — re-verify against the manifest we resolved, so
    // the failure names the contract instead of surfacing as a torn
    // linkTree partway through
    val now = readSnapshot(root, label)
    require(now.exists(sameSnapshot(_, snap)),
      s"exportSnapshot: pin '$label' on $root " +
        (if (now.isEmpty) "was unpinned" else "moved to a different state") +
        " during the export — the label must stay pinned for the " +
        "duration; re-pin and retry")
    commitGeneration(destRoot, stage)
  }

  /** A destination with no live pointer is exportable only if what it
    * holds is crashed-export debris: the lock/lease file, stage dirs
    * (reapStages already cleared them), pointer tmp files, or a
    * generation dir that was moved but never pointed to — unreadable by
    * construction (readers resolve through the live pointer, which the
    * caller proved absent), so exportCore reclaims it. Anything else is
    * a foreign directory, refused. And a crashed export never writes a
    * CONSISTENT _prev.txt next to an absent live pointer
    * (commitGeneration writes _live first, and a first export has no
    * predecessor to record) — so a _prev record naming a generation
    * that EXISTS on disk means this is a real index root that lost only
    * its live pointer (partial copy, manual cleanup, foreign tooling).
    * Reclaiming its generations would destroy recoverable data under
    * the guise of debris cleanup; refuse and name the remedy instead.
    *
    * Shared by the single export and BOTH sides of [[exportPair]]'s
    * pre-flight, so a refusable second destination is discovered BEFORE
    * the first side commits.
    */
  private def validateExportDebris(destRoot: String): Unit = {
    val dest = Paths.get(destRoot)
    require(Files.isDirectory(dest) && {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dest)
      try s.iterator().asScala.forall { p =>
        val n = p.getFileName.toString
        n == ".lock" || n.startsWith(".stage-") || n.startsWith("gen-") ||
          n == LivePointer + ".tmp" || n == PrevPointer ||
          n == PrevPointer + ".tmp"
      } finally s.close()
    }, s"exportSnapshot: $destRoot exists and is not an empty directory")
    val prevP = dest.resolve(PrevPointer)
    if (Files.exists(prevP)) {
      val named = new String(Files.readAllBytes(prevP), UTF_8).trim
        .split(",").toSeq.filter(_.nonEmpty)
      val extant = named.filter(n =>
        genNumber(n).isDefined && Files.isDirectory(dest.resolve(n)))
      require(extant.isEmpty,
        s"exportSnapshot: $destRoot has no live pointer but its " +
          s"$PrevPointer names existing generation(s) " +
          s"${extant.mkString(", ")} — this is an index root that lost " +
          "its live pointer out-of-protocol, not crashed-export debris. " +
          "Restore _live.txt (fsckRepair can arbitrate) or move the " +
          "data aside before exporting here.")
    }
  }

  /** Does `destRoot` already hold the committed export of `snap` (whose
    * pinned generation lives at `srcGenDir`) — the identity check
    * [[exportPair]]'s crash-heal rests on. Structure first: the export's
    * generation carries exactly the manifest's segment set and its
    * tombstone-pair copy. But structure alone cannot tell a fresh
    * foreign index from an export (every fresh build is one `base`
    * segment, zero tombstones), so the decisive test is PHYSICAL:
    * exports move data by hard link, and the pin — which the caller
    * must hold for the export's duration — keeps the source generation
    * alive, so every data file under each manifest segment must share
    * its inode with the same relative path in the pinned generation.
    * (An object-store deployment, which copies instead of links, would
    * substitute a checksum manifest here.) A mutated export (segments
    * added since) deliberately fails the structural half — it is no
    * longer the pin's state.
    */
  private def isExportOf(destRoot: String, snap: Snapshot,
      srcGenDir: String): Boolean =
    liveGenOpt(destRoot).exists { g =>
      segmentValues(g).sorted == snap.segs.sorted &&
        readTombstones(g).toSeq == snap.tombs.toSeq.sorted &&
        snap.segs.forall { s =>
          import scala.jdk.CollectionConverters._
          val (sd, dd) = (Paths.get(srcGenDir, s"seg=$s"), Paths.get(g, s"seg=$s"))
          def filesOf(dir: Path): Map[Path, Object] = {
            val w = Files.walk(dir)
            try w.iterator().asScala.filter(Files.isRegularFile(_))
              .map(p => dir.relativize(p) -> Files.getAttribute(p, "unix:ino"))
              .toMap
            finally w.close()
          }
          try filesOf(sd) == filesOf(dd)
          catch { case _: Exception => false }
        }
    }

  /** [[exportSnapshot]] for BOTH roots of a [[pinPair]], atomic at the
    * destinations: both destination monitors + leases are taken
    * path-ordered (the pinPair idiom) BEFORE any occupancy decision, so
    * two concurrent exportPairs to overlapping destinations serialize
    * instead of interleaving their occupancy checks. Refusals mirror
    * pinPair's: the label missing on either source is the torn-pair
    * state (unpin the survivor and re-pinPair); manifests whose created
    * stamps differ were not written by one pinPair barrier (two
    * independent pins promise no wave consistency — re-pin with
    * pinPair); a committed destination that is NOT this pair's own
    * export refuses loudly. A crash BETWEEN the two exports leaves one
    * destination committed — the retry recognizes it structurally
    * ([[isExportOf]]), skips it, and completes the other side, so the
    * exported pair converges to exactly the pinned wave.
    *
    * Same source-side contract as [[exportSnapshot]]: the label must
    * stay pinned on both roots for the duration.
    */
  def exportPair(rootA: String, rootB: String, label: String,
      destA: String, destB: String,
      fixupA: (Snapshot, String) => Unit = (_, _) => (),
      fixupB: (Snapshot, String) => Unit = (_, _) => ()): (String, String) = {
    requireValidLabel(label)
    require(destA != destB, s"exportPair: the two destinations are the same path ($destA)")
    require(destA != rootA && destA != rootB && destB != rootA && destB != rootB,
      "exportPair: a destination collides with a source root")
    val (sa, sb) = (readSnapshot(rootA, label), readSnapshot(rootB, label))
    val (snapA, snapB) = (sa, sb) match {
      case (Some(a), Some(b)) => (a, b)
      case (None, None) => throw new IllegalArgumentException(
        s"no snapshot pinned as '$label' under $rootA or $rootB")
      case _ =>
        val (has, lacks) = if (sa.isDefined) (rootA, rootB) else (rootB, rootA)
        throw new IllegalStateException(
          s"exportPair '$label': $has is pinned but $lacks is not — a " +
            "crashed earlier pinPair left a torn pair; exporting it would " +
            "ship two sides from DIFFERENT states. unpin '$label' on " +
            s"$has, re-pinPair, then retry.")
    }
    require(snapA.createdMs > 0 && snapA.createdMs == snapB.createdMs,
      s"exportPair '$label': the two manifests carry different created " +
        s"stamps (${snapA.createdMs} vs ${snapB.createdMs}) — they were " +
        "not written by one pinPair barrier, so no wave consistency can " +
        "be promised. Re-pin the pair with pinPair and retry.")
    withRootsLocked(Seq(destA, destB), s"exportPair($label)") {
      reapStages(destA); reapStages(destB)
      // occupancy is decided IN FULL for BOTH destinations before
      // either export stages a byte — committed-root, foreign-file and
      // lost-live-pointer refusals included: a refusal on the second
      // side must not leave a freshly-committed first side — that
      // would be this verb manufacturing the very torn state it exists
      // to heal
      def healed(dest: String, root: String, snap: Snapshot): Boolean =
        if (isExportOf(dest, snap, snapshotGenDir(root, snap))) true
        else if (liveGenOpt(dest).isDefined)
          throw new IllegalStateException(
            s"exportPair '$label': $dest is already an index root and " +
              "NOT this pair's own export — refusing to export over it")
        else { validateExportDebris(dest); false }
      val (okA, okB) = (healed(destA, rootA, snapA), healed(destB, rootB, snapB))
      (if (okA) liveGen(destA) else exportCore(rootA, label, snapA, destA, fixupA),
        if (okB) liveGen(destB) else exportCore(rootB, label, snapB, destB, fixupB))
    }
  }

  // ---- tombstones (deletes) --------------------------------------------------
  //
  // Deletion is LOGICAL first, PHYSICAL later — the LSM/Iceberg shape,
  // and the engine's own tracking-table semantics (delete-then-insert
  // upsert, reference macros/tracking_table_materialization.sql:34).
  // A delete records (segment, id) pairs in a per-generation tombstone
  // sidecar: the id is hidden in every segment PRESENT at delete time,
  // so a LATER append — a new segment by construction — re-inserts the
  // id without resurrecting the old rows and without any tombstone
  // rewrite on the append path (later insert wins, structurally). The
  // sidecar is bounded metadata — |ids| × |segments|, with takedown
  // lists small and segment counts bounded by the compaction cadence —
  // and the next compaction/rebalance drops the rows physically and
  // clears it.
  //
  // Crash safety: the sidecar is rewritten whole via tmp + ATOMIC_MOVE
  // under the mutation lease, so readers observe the old or the new
  // set, never a torn file — a delete is all-or-nothing across the
  // generation's segments. Idempotence is structural (set union), so a
  // replayed delete needs no token.

  private val TombstoneFile = "_tombstones.txt"

  /** The generation's (segment, deleted id) pairs, sorted. */
  def readTombstones(genDir: String): Array[(String, Long)] = {
    val p = Paths.get(genDir, TombstoneFile)
    if (!Files.exists(p)) Array.empty
    else new String(Files.readAllBytes(p), UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf(',')
        (line.substring(0, i), line.substring(i + 1).toLong)
      }.toArray.sorted
  }

  /** The distinct deleted ids (the user-facing view of the set). */
  def tombstonedIds(genDir: String): Array[Long] =
    readTombstones(genDir).map(_._2).distinct.sorted

  private def writeTombstonesAtomic(genDir: String,
      pairs: Array[(String, Long)]): Unit = {
    val tmp = Paths.get(genDir, TombstoneFile + ".tmp")
    Files.write(tmp, tombstoneLines(pairs))
    Files.move(tmp, Paths.get(genDir, TombstoneFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The bounded-metadata contract on the tombstone sidecar: (seg, id)
    * pairs are driver-side state carried into every screen's anti-join,
    * so the takedown path is for BOUNDED lists — past this cap a delete
    * fails loudly naming the corpus-scale remedies (the PairBudget
    * philosophy: never silently degrade every later read) instead of
    * quietly growing a sidecar that taxes each query. Overridable for
    * specs ([[graft.ops.Dedup.lastByteCap]]'s telemetry-var precedent).
    */
  @volatile private[graft] var tombstonePairCap: Int = 1 << 20

  /** Delete `ids` from every segment currently committed in the
    * generation (callers hold the mutation lease). Returns the distinct
    * deleted-id count after the union. Refuses loudly past
    * [[tombstonePairCap]] — a corpus-scale removal belongs on the
    * `deleteWhere` rewrite path, and an accumulated set is reclaimed by
    * `compactIndex`.
    */
  def addTombstones(genDir: String, ids: Iterable[Long]): Int = {
    val segs = segmentValues(genDir)
    val merged = (readTombstones(genDir).toSet ++
      (for (s <- segs; id <- ids) yield (s, id))).toArray
    require(merged.length <= tombstonePairCap,
      s"addTombstones($genDir): ${merged.length} (seg, id) pairs exceed the " +
        s"bounded-metadata cap ($tombstonePairCap). Remedies: a corpus-scale " +
        "DELETE belongs on deleteWhere (one filtered survivor rewrite, no " +
        "sidecar); a large UPSERT/CDC re-embed wave on a many-segment index " +
        "should compactIndex first (pairs scale with segment count) and " +
        "retry; an accumulated takedown set is reclaimed by compactIndex")
    writeTombstonesAtomic(genDir, merged)
    merged.map(_._2).distinct.length
  }

  /** Subtract the generation's tombstones from an index read — the ONE
    * place every screen honors deletes through. The subtraction is
    * segment-scoped: a row dies only if its `seg` partition value was
    * present at delete time, so re-inserted ids in later segments
    * survive. A bounded pair set rides the plan as a hash-set probe on
    * a (seg, id) key; a drained-by-compaction-overdue set falls back to
    * a broadcast anti-join so the plan never carries an unbounded
    * literal.
    */
  def minusTombstones(df: org.apache.spark.sql.DataFrame, genDir: String,
      idCol: String = "vec_id"): org.apache.spark.sql.DataFrame =
    minusTombstonePairs(df, readTombstones(genDir), idCol)

  /** [[minusTombstones]] with an EXPLICIT pair set — what a pinned
    * snapshot read subtracts: the pairs recorded in its manifest at pin
    * time, not whatever the generation's live sidecar has since grown
    * to.
    */
  def minusTombstonePairs(df: org.apache.spark.sql.DataFrame,
      tombs: Array[(String, Long)],
      idCol: String = "vec_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, concat_ws, lit, not}
    if (tombs.isEmpty) df
    else {
      val key = concat_ws("\u0000", col("seg"), col(idCol).cast("string"))
      if (tombs.length <= 4096)
        df.filter(not(key.isin(tombs.map { case (s, id) => s + "\u0000" + id }
          .toIndexedSeq: _*)))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val tombDf = tombs.toIndexedSeq.toDF("seg", idCol)
          .select(concat_ws("\u0000", col("seg"), col(idCol).cast("string")).as("__tk"))
        df.join(broadcast(tombDf), key === col("__tk"), "left_anti")
      }
    }
  }
}
