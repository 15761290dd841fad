package graft.util

/** Bounded LRU memo keyed by (owner identity, name) — the shape every
  * per-(session, fixture-dir) cache in the repo needs. Plain maps
  * keyed on `System.identityHashCode(spark)` never forget: entries
  * for stopped sessions pin their analyzed plans (and, for
  * checkpoint-valued caches, executor block storage) for the JVM
  * lifetime — harmless in a one-session harness run, a leak in any
  * long-lived multi-session driver (VERDICT r8). An LRU bound makes
  * the retention ceiling explicit and `onEvict` lets checkpoint-valued
  * caches release storage at eviction rather than never.
  *
  * Access-ordered LinkedHashMap under the cache's own lock; the
  * compute runs inside it (same discipline as the previous
  * `ConcurrentHashMap.computeIfAbsent` — builders are invoked
  * sequentially by Verify/Bench, so contention is nil and a duplicate
  * concurrent compute would be the worse trade).
  */
final class SessionCache[V <: AnyRef](maxEntries: Int,
    onEvict: V => Unit = (_: V) => (),
    val coldExempt: Boolean = false) {
  require(maxEntries >= 1, s"SessionCache: maxEntries $maxEntries < 1")
  SessionCache.register(this)

  /** Reference-identity key: `identityHashCode` alone is a 32-bit hash,
    * not an identity — two live sessions CAN collide and would then
    * hand one session a DataFrame bound to the other (r9 review). The
    * wrapper keeps identityHashCode for bucketing but compares with
    * `eq`, so a collision degrades to a bucket neighbor, never a wrong
    * hit. The strong ref to a stopped owner lives only until its entry
    * ages out of the LRU — the same bounded retention as before.
    */
  private final class IdKey(val ref: AnyRef, val name: String) {
    override def hashCode: Int =
      System.identityHashCode(ref) * 31 + name.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: IdKey => (k.ref eq ref) && k.name == name
      case _ => false
    }
  }

  private val m =
    new java.util.LinkedHashMap[IdKey, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[IdKey, V]): Boolean =
        if (size > maxEntries) { onEvict(e.getValue); true } else false
    }

  def getOrElseUpdate(owner: AnyRef, key: String)(v: => V): V =
    m.synchronized {
      val k = new IdKey(owner, key)
      val existing = m.get(k)
      if (existing != null) existing
      else { val computed = v; m.put(k, computed); computed }
    }

  def size: Int = m.synchronized(m.size)

  /** Evict every entry (onEvict invoked per value, releasing pinned
    * checkpoint blocks) — the cold-run hook. */
  def clear(): Unit = m.synchronized {
    val it = m.values.iterator()
    while (it.hasNext) onEvict(it.next())
    m.clear()
  }
}

/** Global registry of every SessionCache instance, so Bench can evict
  * ALL result memos before a query's first timed execution and price
  * the un-amortized cost (VERDICT r9 top item: min-of-two + memos made
  * `text_bpe_train` bench as a 0.15 s memo read, not a ~2 s train).
  *
  * `coldExempt` opts a cache OUT of cold eviction — reserved for
  * caches that memoize SUBSTRATE rather than results: `Tables`'
  * analyzed read plans (re-reading parquet footers is harness noise,
  * not operator cost) and on-disk layout paths (`SourceQueries`'/
  * `ScaleProbe`'s DPP fact layouts — a lake table is written once and
  * joined daily; the one-time rewrite being outside the timed number
  * is the documented join_dpp_runtime design). Everything holding a
  * computed RESULT (pinned projections, PCA solves, exact-eval arms)
  * stays evictable so run 1 pays full freight.
  */
object SessionCache {
  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[SessionCache[_]]

  private def register(c: SessionCache[_]): Unit = registry.add(c)

  /** Evict every non-exempt cache — see object doc. */
  def evictAllForCold(): Unit = {
    val it = registry.iterator()
    while (it.hasNext) {
      val c = it.next()
      if (!c.coldExempt) c.clear()
    }
  }
}
