package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Scoped caching for operators whose RETURNED frame consumes one
  * intermediate several times (band join + verify join, totals +
  * per-token table, …). A plain `persist` there leaks: the operator
  * never sees the caller's action, so nothing ever unpersists, and in a
  * long-lived session (the API server, repeated recipe runs) the
  * MEMORY_AND_DISK entries accumulate until memory pressure — cached
  * tables are NOT evicted LRU-style at action end, they live until
  * `unpersist`/session stop.
  *
  * [[cache]] persists the frame and registers its cache entry with a
  * session-wide [[QueryExecutionListener]]; the first completed action
  * whose plan referenced that entry (i.e. the caller finally ran the
  * operator's result) unpersists it. Within that one action the cache
  * still does its job — every reuse inside a single execution reads the
  * cached blocks. A caller running SEVERAL actions over the same result
  * pays a recompute from the second action on — correct, just not
  * re-cached; callers with that shape should persist at their own level.
  */
object AutoUnpersist {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.AutoUnpersist")

  // cache entry (CachedRDDBuilder) → the frame to unpersist. The builder
  // instance is shared by every InMemoryRelation the CacheManager hands
  // out for the entry, so it identifies "this cache" across plan copies.
  private val pending = new ConcurrentHashMap[AnyRef, DataFrame]()
  // weakly held, like Metrics.registeredSessions: a strong set would pin
  // every stopped session (and its whole SparkContext state) for the
  // process lifetime
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  // bound on never-consumed registrations: entries normally leave when
  // their action completes, but a plan BUILT and never executed (a later
  // step fails at compile, an explain-only path) has no action — without
  // a cap each one pins its DataFrame + cache entry for the process
  // lifetime (the API server compiles recipes on every PUT). Evicting
  // the oldest is always SAFE: a still-wanted cache that was evicted
  // just recomputes when its action finally runs.
  private val MaxPending = 64
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()

  /** Persist `df` and unpersist it automatically after the first
    * completed action that read the cache. Returns the persisted frame.
    *
    * `drainFirst = true` is for the persist-first / act / register-last
    * callers ONLY (contaminatedIds' count-gated broadcast, the near-dup
    * probe's hit count, the Jaccard df map, the q111 fixture): their own
    * pre-registration actions must not count as the scope's first
    * action, but QueryExecutionListener events arrive asynchronously,
    * so a still-queued event for one of those already-completed actions
    * could land after this registration and release the entry
    * immediately (observed: the q68 cached-id-set plan flake). Draining
    * the bus before registering closes that window; on timeout we
    * proceed and accept the original tiny race rather than fail the
    * operator. Build-time registrations with no prior action on the
    * entry skip the drain (r16, the r15 advice): a backlogged shared
    * bus would otherwise tax every cache() call — per-micro-batch
    * operators included — with an up-to-10 s wait that protects them
    * from nothing. */
  def cache(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      drainFirst: Boolean = false): DataFrame = {
    val cached = df.persist(level)
    builderOf(cached) match {
      case Some(b) =>
        install(cached.sparkSession)
        if (drainFirst)
          org.apache.spark.GraftSparkBridge.drainListenerBus(
            cached.sparkSession.sparkContext)
        // queue maintenance is serialized: an unsynchronized
        // peek/containsKey/poll pair racing another cache() call could
        // poll a LIVE entry's token, leaving that entry unevictable and
        // re-opening the unbounded growth this bound exists to prevent.
        // cache() runs once per operator BUILD (not per row/task), so
        // the lock is uncontended in practice.
        order.synchronized {
          // re-registering the same cache entry must not enqueue a
          // second token (the stale first token would evict the fresh
          // registration early)
          if (pending.put(b, cached) == null) order.add(b)
          // drop queue heads the listener already released — keeps the
          // queue tracking pending, not all-time history
          var h = order.peek()
          while (h != null && !pending.containsKey(h)) {
            order.poll(); h = order.peek()
          }
          var over = pending.size > MaxPending
          while (over) {
            val old = order.poll()
            if (old == null) over = false
            else {
              val victim = pending.remove(old)
              if (victim != null) {
                // debug-visible: an evicted entry that a caller still
                // meant to reuse silently recomputes from its second
                // action on — the log line is the only diagnosis trail
                log.debug("evicting never-consumed cache entry " +
                  s"(pending=${pending.size}, bound=$MaxPending)")
                try victim.unpersist(blocking = false)
                catch { case scala.util.control.NonFatal(_) => }
              }
              over = pending.size > MaxPending
            }
          }
        }
      case None => // cache entry not visible — degrade to a plain persist
    }
    cached
  }

  /** Frames registered and not yet released (test/diagnostic hook). */
  def pendingCount: Int = pending.size

  /** Unpersist every pending frame now — session teardown, or a caller
    * that built plans (explain, dry-run) it will never execute. */
  def releaseAll(): Unit = order.synchronized {
    val it = pending.keySet.iterator
    while (it.hasNext) {
      val df = pending.remove(it.next())
      // a pending frame may belong to an already-stopped session —
      // nothing left to release, and its unpersist throws
      if (df != null)
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => }
    }
    // the tokens hold strong CachedRDDBuilder refs (whose plans pin
    // their session) — session teardown must drop them too
    order.clear()
  }

  private def builderOf(df: DataFrame): Option[AnyRef] =
    df.queryExecution.withCachedData.collectFirst {
      case ir: InMemoryRelation => ir.cacheBuilder
    }

  private def install(spark: SparkSession): Unit = synchronized {
    if (installed.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = release(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = release(qe)
        private def release(qe: QueryExecution): Unit = try {
          // withCachedData re-throws the original failure for a query
          // that never analyzed — nothing to release there, and a
          // throwing listener is pure log spam
          qe.withCachedData.collect { case ir: InMemoryRelation =>
            ir.cacheBuilder
          }.foreach { b =>
            val df = pending.remove(b)
            if (df != null) {
              // Spark's CacheManager dedups entries by logical-plan
              // equality, so this release can also drop a cache an
              // OUTSIDE caller persisted for an equal plan — correct
              // (recompute is deterministic) but a perf surprise worth
              // a diagnosable trace
              log.debug("releasing operator cache after first action")
              df.unpersist(blocking = false)
            }
          }
        } catch { case scala.util.control.NonFatal(_) => }
      })
  }
}
