package graft

/** Registry of module-level DataFrame memo holders.
  *
  * Modules that memoize cached intermediates (e.g. DedupQueries' shared
  * shingle tables) register their reset hook here at object init; any
  * measurement harness then calls [[resetAll]] between queries to restore
  * cold-start isolation WITHOUT naming each memoizing module. The
  * hard-coded alternative (Bench calling one module's resetMemo by name)
  * meant every future memoizing module would silently reintroduce
  * cross-query cache coupling — the q25/q78 100x trap: clearing the
  * catalog cache alone leaves live memoized references that recompute
  * uncached on every reuse.
  *
  * Reset order is registration order; hooks must be idempotent (a reset
  * of an empty memo is a no-op).
  */
object MemoRegistry {
  private val resets = new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Register a module's memo-reset hook. Called once per module (object
    * initializers run once per JVM). */
  def register(reset: () => Unit): Unit = { resets.add(reset); () }

  /** Invoke every registered hook. Harnesses call this BEFORE
    * spark.catalog.clearCache() so dropped memos release their cache
    * registrations through their own unpersist logic first. */
  def resetAll(): Unit = resets.forEach(r => r())
}
