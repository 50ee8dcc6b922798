package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized-intermediate cache, keyed by the
  * CANONICALIZED logical plan of the defining input (plus any operator
  * parameters): the in-session stand-in for the persisted intermediate
  * table a production pipeline would land in the lake once per curation
  * run and read from every downstream report. Two scans of the same
  * parquet path canonicalize identically and hit; different paths or
  * parameters miss.
  *
  * The value is a `persist(level)`-cached frame: recomputable
  * lineage (a lost executor re-derives partitions, unlike
  * localCheckpoint), spill-safe, and once materialized the
  * InMemoryRelation reports REAL stats, so downstream joins broadcast on
  * actual sizes rather than estimates. Bounded: at most [[maxEntries]]
  * cached inputs per session with eldest-eviction + unpersist.
  *
  * Lifecycle: entries are keyed by a per-session id String — never the
  * session object, whose DataFrames would otherwise pin it; the r14
  * WeakHashMap-of-sessions spelling was exactly that value-refs-key leak
  * and never collected anything. (The id map itself IS weakly keyed, but
  * its String values hold no reference back to the session, so that one
  * genuinely collects.) The first materialization for a session installs
  * a SparkListener that drops and unpersists all of that session's
  * entries — across every family cache — on application end, so a
  * stopped session leaves nothing behind. Sessions that share one
  * SparkContext (`newSession()`) are evicted together when the context
  * stops, which is also when their cached blocks die.
  *
  * IMMUTABLE-INPUT ASSUMPTION: the cache key is the input's logical
  * plan, not its data — if the underlying files are rewritten
  * mid-session, downstream reads keep serving the stale materialization.
  * That is the contract of a landed intermediate table (recompute is a
  * new run), but a caller that must re-ingest in-session can call
  * [[PlanCache.invalidate]] to drop and unpersist every family's entries
  * for the session.
  *
  * Instantiate one per operator family (each family bounds its own
  * working set — a hot dedup corpus can never evict the sentence table).
  *
  * `level` sizes the cache to its content class: duplicate-volume-BOUNDED
  * intermediates (the near-dup pair table, ~16 MB even at the 20× probe)
  * may pin unified memory (MEMORY_AND_DISK, the default); CORPUS-SIZED
  * intermediates (the sentence segmentation — it carries the full text)
  * must use DISK_ONLY. A corpus-sized on-heap cache evicts down to the
  * protected storage fraction and squeezes execution memory for every
  * heavy join that follows in the same executor — measured at the 20×
  * probe: with the segmentation MEMORY_AND_DISK, `dedup_containment`
  * spilled 14 GB and ran a 94–145 s band vs its 74 s baseline, and the
  * post-pair clustering reports doubled; DISK_ONLY restores them while
  * keeping the shared-read win. It is also the production shape: a
  * landed intermediate lives in the lake, not in executor memory.
  */
private[graft] final class PlanCache(maxEntries: Int = 4,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String,
    scala.collection.mutable.LinkedHashMap[Any, DataFrame]]()
  PlanCache.register(this)

  /** The cached frame for (`input`'s canonical plan, `params`), built and
    * persisted via `build` on first use. `build` must be a pure function
    * of (input, params) — the cache makes it at-most-once per session.
    */
  def getOrMaterialize(input: DataFrame, params: Any)
      (build: => DataFrame): DataFrame = {
    val spark = input.sparkSession
    PlanCache.ensureEvictionListener(spark)
    val perSession = cache.computeIfAbsent(PlanCache.sessionId(spark),
      _ => scala.collection.mutable.LinkedHashMap.empty)
    val key = (input.queryExecution.analyzed.canonicalized, params)
    perSession.synchronized {
      perSession.getOrElseUpdate(key, {
        if (perSession.size >= maxEntries) {
          val (oldKey, oldDf) = perSession.head
          perSession.remove(oldKey)
          oldDf.unpersist(blocking = false)
        }
        build.persist(level)
      })
    }
  }

  /** Entries currently held for `sessionUUID` (test observability). */
  private[graft] def entryCount(sessionUUID: String): Int = {
    val m = cache.get(sessionUUID)
    if (m == null) 0 else m.synchronized(m.size)
  }

  /** Drop (and best-effort unpersist) this family's entries for the
    * session. Unpersist failures are swallowed: on application end the
    * block manager is already going down and the blocks die with it.
    */
  private[graft] def invalidateSession(sessionUUID: String): Unit = {
    val m = cache.remove(sessionUUID)
    if (m != null) m.synchronized {
      m.values.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      m.clear()
    }
  }
}

/** Registry over every family's [[PlanCache]] instance: the public
  * invalidation face and the shared session-end eviction listener.
  */
object PlanCache {
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[PlanCache]()
  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def register(c: PlanCache): Unit = instances.add(c)

  /** Stable per-session id. Spark 4's public SparkSession exposes no
    * session UUID, so we mint one: the map is weakly keyed and its
    * String values hold no reference to the session, so a dropped
    * session's id entry is collectable (unlike caching frames against
    * the session itself).
    */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private[graft] def sessionId(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  /** Drop and unpersist every family's cached intermediates for `spark`.
    * Call after rewriting a cached input's underlying files in-session
    * (see the immutable-input assumption on [[PlanCache]]).
    *
    * Caches ONLY — deliberately NOT the session-end hooks: cached plans
    * are lazily recomputable (the next lookup rebuilds), but the hooks
    * destroy NON-recomputable state ([[Skew.bucketize]]'s physical
    * bucket tables, which live bucketized DataFrames still read), so
    * they run exactly once, at application end, never on a mid-session
    * re-ingest invalidation.
    */
  def invalidate(spark: SparkSession): Unit =
    instances.forEach(_.invalidateSession(sessionId(spark)))

  /** Arbitrary session-scoped cleanups sharing the eviction listener —
    * e.g. [[Skew.bucketize]]'s physical bucket tables, which would
    * otherwise orphan files in a shared warehouse on session crash.
    * Hooks run (once, best-effort) alongside cache eviction at
    * application end. A hook MUST NOT strongly capture the
    * SparkSession: the registry is keyed by the session-id String
    * precisely so entries never pin the session (the r14 leak) — hold a
    * WeakReference if session access is needed.
    */
  private val sessionHooks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CopyOnWriteArrayList[() => Unit]]()

  private[graft] def addSessionEndHook(spark: SparkSession)(f: () => Unit): Unit = {
    ensureEvictionListener(spark)
    sessionHooks.computeIfAbsent(sessionId(spark),
      _ => new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()).add(f)
  }

  /** Application-end teardown: caches AND the destructive session-end
    * hooks. Only the eviction listener (and specs standing in for it)
    * may call this — the mid-session face is [[invalidate]].
    */
  private[graft] def invalidateAll(sessionUUID: String): Unit = {
    tracked.remove(sessionUUID)
    instances.forEach(_.invalidateSession(sessionUUID))
    val hooks = sessionHooks.remove(sessionUUID)
    if (hooks != null) hooks.forEach { f =>
      try f() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Install (once per session) the application-end eviction hook. */
  private def ensureEvictionListener(spark: SparkSession): Unit = {
    val id = sessionId(spark)
    if (tracked.add(id)) {
      spark.sparkContext.addSparkListener(sessionEndListener(id))
    }
  }

  /** The eviction hook itself, factored so a spec can fire it directly:
    * delivery of `onApplicationEnd` at context stop is Spark's contract,
    * the eviction it triggers is ours.
    */
  private[graft] def sessionEndListener(sessionUUID: String): SparkListener =
    new SparkListener {
      override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
        invalidateAll(sessionUUID)
    }
}
