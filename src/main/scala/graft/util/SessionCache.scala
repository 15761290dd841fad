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
    onEvict: V => Unit = (_: V) => ()) {
  require(maxEntries >= 1, s"SessionCache: maxEntries $maxEntries < 1")

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
}
