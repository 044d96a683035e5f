package graft

/** The per-(session, dir) artifact memoization discipline in ONE place
  * (round-12 review: the idiom had been hand-expanded at ~7 sites):
  * compute OUTSIDE the map — `computeIfAbsent` would hold the
  * ConcurrentHashMap bin lock for the build's whole duration (here
  * usually a multi-second Spark job), stalling concurrent lookups and
  * risking the documented CHM re-entrancy deadlock. Racing builds are
  * expected to be idempotent (every cached derivation in this repo is
  * deterministic); the first put wins and the loser's build is simply
  * unused.
  */
object Memo {
  def memo[K, V](cache: java.util.concurrent.ConcurrentHashMap[K, V], key: K)(
      build: => V): V = {
    val cached = cache.get(key)
    if (cached != null) cached
    else {
      val built = build
      val prior = cache.putIfAbsent(key, built)
      if (prior != null) prior else built
    }
  }

  private val latchLocks =
    new java.util.concurrent.ConcurrentHashMap[(AnyRef, Any), AnyRef]()

  /** The SIDE-EFFECTFUL sibling of [[memo]] (round-15 review — the
    * latch-after-write-under-monitor idiom had been hand-expanded at
    * three export sites with drifting copies, the exact class
    * [[memo]] was created to stop): for builds whose side effects
    * must run EXACTLY once per key (a filesystem export, a catalog
    * registration — racing idempotent losers would orphan scratch
    * copies or half-written tables).
    *
    *  - latch AFTER the build succeeds: a throwing build leaves the
    *    key unlatched, so the next caller retries and fails at the
    *    cause instead of on the missing artifact downstream;
    *  - serialize concurrent builders PER KEY (round-15 review: one
    *    global monitor queued Verify's 4-way-concurrent first-time
    *    exports behind each other even though their keys were
    *    disjoint); the lock map is bounded by the live key count.
    */
  def latched[K, V](cache: java.util.concurrent.ConcurrentHashMap[K, V], key: K)(
      build: => V): V = {
    val cached = cache.get(key)
    if (cached != null) cached
    else {
      val lock = latchLocks.computeIfAbsent(
        (cache.asInstanceOf[AnyRef], key), _ => new Object)
      lock.synchronized {
        val again = cache.get(key)
        if (again != null) again
        else { val built = build; cache.put(key, built); built }
      }
    }
  }

  /** Bounded access-order LRU map for caches whose VALUES pin
    * executor storage (eagerly-materialized localCheckpoint blocks —
    * round-15 review: an unbounded (session, dir)-keyed map holds a
    * strong reference forever, so ContextCleaner can never free the
    * blocks and block-manager usage grows monotonically in a
    * long-lived JVM). Dropping the eldest entry releases the only
    * strong reference; the blocks follow at the next GC+cleaner pass.
    * All operations are synchronized (access-order LinkedHashMap
    * mutates on get).
    */
  def lruCache[K, V](max: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > max
      })

  /** [[memo]] over an [[lruCache]]: compute outside the lock, racing
    * idempotent builders tolerated, first-put-wins not guaranteed
    * (last put wins — fine for deterministic derivations).
    */
  def lruMemo[K, V](cache: java.util.Map[K, V], key: K)(build: => V): V = {
    val cached = cache.get(key)
    if (cached != null) cached
    else { val built = build; cache.put(key, built); built }
  }
}
