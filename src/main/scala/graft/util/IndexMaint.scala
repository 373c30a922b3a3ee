package graft.util

/** Shared maintenance plumbing for persisted ANN index directories
  * ([[graft.ops.Ivf]] and [[graft.ops.Pq]]): per-path monitors,
  * applied-batch token sidecars (streaming replay idempotence), and the
  * two-move atomic swap with `.old` crash recovery. ONE implementation
  * so a fix to the swap or replay protocol cannot silently reach one
  * index family and miss the other (the prior copies drifted exactly
  * that way). Distinct from [[AtomicSwap]] (Hadoop-FS, dot-prefixed
  * scratch siblings for tracking tables): the index contract is
  * java.nio with the spec-pinned `.old` / `.rebuild` sibling names.
  */
object IndexMaint {

  private val locks =
    new scala.collection.concurrent.TrieMap[String, Object]()

  /** One monitor per index path — serializes builds, swaps, token
    * appends, and recovery (paths are globally unique, so IVF and PQ
    * sharing the map is harmless).
    */
  def lockFor(path: String): Object = locks.getOrElseUpdate(path, new Object)

  // ---- applied-batch token sidecar ------------------------------------------

  def readTokens(path: String, sidecar: String): Set[String] = {
    val p = java.nio.file.Paths.get(path, sidecar)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).toSet
  }

  /** Token shape check — callers run this BEFORE mutating the index so
    * a malformed token fails fast instead of after the append committed
    * (which would leave applied-but-untracked vectors that a retried
    * sanitized token then duplicates).
    */
  def requireValidToken(token: String): Unit =
    require(!token.contains("\n"), "append token must be a single line")

  def recordToken(path: String, sidecar: String, token: String): Unit = {
    requireValidToken(token)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, sidecar),
      (token + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Carry the token sidecar into a rebuild directory before the swap:
    * the rebuild re-encodes content already in the index, so a
    * post-swap replay of an old batch must still no-op.
    */
  def carryTokens(from: String, to: String, sidecar: String): Unit = {
    val src = java.nio.file.Paths.get(from, sidecar)
    if (java.nio.file.Files.exists(src))
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(to, sidecar))
  }

  // ---- two-move swap + crash recovery ---------------------------------------

  /** Swap `tmp` in as the live generation: reap a leftover `.old`
    * (crash between a previous swap's second move and its reap — the
    * rename below would throw on it), live → `.old`, tmp → live, reap
    * `.old`. On an object store this whole sequence is one manifest
    * pointer flip; callers hold [[lockFor]] `path`.
    */
  def swapLive(path: String, tmp: String): Unit = {
    val live = java.nio.file.Paths.get(path)
    val old = java.nio.file.Paths.get(path + ".old")
    if (java.nio.file.Files.exists(old)) Fs.deleteRecursively(path + ".old")
    java.nio.file.Files.move(live, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), live)
    Fs.deleteRecursively(path + ".old")
  }

  /** Loader-side recovery: live missing + `.old` present (crash between
    * the two moves) → restore the old generation; both present (crash
    * between the second move and the reap) → reap the stale `.old` so
    * the next swap's rename cannot hit it. Callers hold [[lockFor]].
    */
  def recoverLive(path: String): Unit = {
    val live = java.nio.file.Paths.get(path)
    val old = java.nio.file.Paths.get(path + ".old")
    if (!java.nio.file.Files.exists(live) && java.nio.file.Files.exists(old))
      java.nio.file.Files.move(old, live)
    else if (java.nio.file.Files.exists(live) && java.nio.file.Files.exists(old))
      Fs.deleteRecursively(path + ".old")
  }
}
