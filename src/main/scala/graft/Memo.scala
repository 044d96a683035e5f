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
}
