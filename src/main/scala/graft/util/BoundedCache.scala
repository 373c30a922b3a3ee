package graft.util

/** Access-ordered, bounded session memo for index handles — ONE
  * implementation for the IVF / PQ / residual (and any future) index
  * families, which each carried an identical LinkedHashMap + eviction
  * idiom before (the IndexMaint lesson: per-family copies drift). A
  * session touches a handful of distinct indexes; stale fingerprints
  * age out instead of accumulating.
  */
final class BoundedCache[K, V](max: Int) {
  private val m = new java.util.LinkedHashMap[K, V](max, 0.75f, true) {
    override protected def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }

  def get(key: K): Option[V] = m.synchronized(Option(m.get(key)))

  /** Insert `value`, atomically dropping entries `stale` marks — the
    * build-memo idiom: entries for the same path under another
    * fingerprint/shape describe overwritten data and must not linger.
    */
  def putReplacing(key: K, value: V)(stale: K => Boolean): Unit =
    m.synchronized {
      m.keySet.removeIf(k => stale(k))
      m.put(key, value); ()
    }

  /** Drop entries matching `pred` (rebalance/compact invalidation). */
  def evict(pred: K => Boolean): Unit =
    m.synchronized { m.keySet.removeIf(k => pred(k)); () }

  def keys: Seq[K] = m.synchronized {
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.toList
  }

  /** The build-memo choreography every index family's
    * `buildIndexCached` runs: double-checked under the caller's
    * per-path monitor (two concurrent misses for the same path must
    * not race overlapping mode-overwrite writes), stale keys for the
    * same path — another fingerprint or build shape — evicted on
    * rebuild. One implementation; the per-family copies drifted before.
    */
  def memoized(key: K, monitor: AnyRef)(stale: K => Boolean)(build: => V): V =
    get(key).getOrElse {
      monitor.synchronized {
        get(key).getOrElse {
          val built = build
          putReplacing(key, built)(stale)
          built
        }
      }
    }
}
