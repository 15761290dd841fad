package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.SessionCache

/** LRU semantics of the bounded per-(owner, key) memo that backs the
  * Tables plan cache and the graph pinned-projection cache.
  */
class SessionCacheSuite extends AnyFunSuite {

  test("caches per (owner, key): hit does not recompute") {
    val c = new SessionCache[String](4)
    val owner = new Object
    var computes = 0
    def get() = c.getOrElseUpdate(owner, "k") { computes += 1; "v" }
    assert(get() == "v" && get() == "v" && computes == 1)
  }

  test("distinct owners with the same key get distinct entries") {
    val c = new SessionCache[String](4)
    val (a, b) = (new Object, new Object)
    assert(c.getOrElseUpdate(a, "k")("va") == "va")
    assert(c.getOrElseUpdate(b, "k")("vb") == "vb")
    assert(c.size == 2)
  }

  test("size never exceeds the bound; eldest entries evict with callback") {
    var evicted = List.empty[String]
    val c = new SessionCache[String](3, v => evicted ::= v)
    val owner = new Object
    (1 to 10).foreach(i => c.getOrElseUpdate(owner, s"k$i")(s"v$i"))
    assert(c.size == 3)
    assert(evicted.length == 7)
    assert(evicted.contains("v1") && !evicted.contains("v10"))
  }

  test("access refreshes LRU order: a touched entry survives eviction") {
    val c = new SessionCache[String](2)
    val owner = new Object
    c.getOrElseUpdate(owner, "a")("va")
    c.getOrElseUpdate(owner, "b")("vb")
    c.getOrElseUpdate(owner, "a")("RECOMPUTED") // touch: a is now newest
    c.getOrElseUpdate(owner, "c")("vc") // evicts b, not a
    var recomputed = false
    assert(c.getOrElseUpdate(owner, "a") { recomputed = true; "x" } == "va")
    assert(!recomputed, "touched entry must have survived the eviction")
  }
}
