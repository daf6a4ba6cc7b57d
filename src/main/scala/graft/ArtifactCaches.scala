package graft

/** Registry + bound for the driver-side memoized trained artifacts
  * (Lloyd centroids, PQ/IVF-PQ codebooks, NSW edge lists, BPE merge
  * tables, dedup cluster labels).
  *
  * Two jobs, both born from the round-9 bench drift (295 unchanged
  * queries grew 1.61× as the catalog grew — JVM residency, not plans):
  *
  *  1. BOUND: each map holds one entry per corpus fingerprint, which is
  *     1-3 entries in any driver run — but a long-lived session (or a
  *     multi-SF Verify loop) accretes entries forever, and a label
  *     table or checkpointed frame per corpus is real heap. When a MISS
  *     would push a map past [[Cap]] distinct corpora, the map is
  *     cleared: artifacts are pure functions of the corpus, so the only
  *     cost is retraining on next touch — strictly better than
  *     unbounded growth. Hits never evict (the hot path stays hot).
  *
  *  2. COUNT: [[sizes]] reports per-cache entry counts so the bench
  *     artifact can print residency alongside GC time — the telemetry
  *     VERDICT r9 asked for to make drift attributable from the
  *     artifact alone.
  */
object ArtifactCaches {
  private val Cap = 16
  private val regs = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[_, _]]()

  /** Memoize `train(key)` in `cache`, registering the cache under
    * `name` for telemetry and clearing it if a miss would exceed the
    * corpus-count bound. Same contract as `computeIfAbsent` (train runs
    * at most once per resident key; retrain after an eviction). */
  def memo[K, V](name: String,
                 cache: java.util.concurrent.ConcurrentHashMap[K, V])(
                 key: K)(train: K => V): V = {
    regs.putIfAbsent(name, cache)
    if (cache.size >= Cap && !cache.containsKey(key)) cache.clear()
    cache.computeIfAbsent(key, k => train(k))
  }

  /** Per-cache resident entry counts (only caches touched so far). */
  def sizes: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    regs.forEach((k, v) => b += k -> v.size)
    b.result()
  }

  /** Total resident artifact entries across all registered caches. */
  def entryCount: Int = sizes.values.sum
}
