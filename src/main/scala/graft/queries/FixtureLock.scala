package graft.queries

/** JVM-wide build-once guard for the shared on-disk query fixtures
  * (ordered event/doc slabs, the JSONL corruption fixture).
  *
  * The fixtures are `_SUCCESS`-guarded so repeated invocations reuse the
  * files, but the guard alone is check-then-act: two queries sharing a
  * fixture (e.g. `q_jsonl_ingest` / `q_stream_jsonl_ingest`) that start
  * concurrently — which happens once Verify runs queries on a thread
  * pool — would both see "missing" and interleave writes into the same
  * directory. One striped lock per fixture path makes the build
  * exactly-once per JVM; cross-JVM safety is unchanged (same `_SUCCESS`
  * discipline as before — concurrent *processes* never shared fixtures
  * in any harness).
  */
private[queries] object FixtureLock {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `build` under the lock for `dir`. The caller re-checks its
    * `_SUCCESS` sentinel inside `build`, so losers of the race see the
    * winner's completed fixture and skip the write.
    */
  def withLock[T](dir: String)(build: => T): T =
    locks.computeIfAbsent(dir, _ => new Object).synchronized(build)
}
