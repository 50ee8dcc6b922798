package graft.operators

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
  * The value is a `persist(MEMORY_AND_DISK)`-cached frame: recomputable
  * lineage (a lost executor re-derives partitions, unlike
  * localCheckpoint), spill-safe, and once materialized the
  * InMemoryRelation reports REAL stats, so downstream joins broadcast on
  * actual sizes rather than estimates. Bounded: at most [[maxEntries]]
  * cached inputs per session with eldest-eviction + unpersist; sessions
  * are weakly keyed so a stopped session's entries are collectable.
  *
  * Instantiate one per operator family (each family bounds its own
  * working set — a hot dedup corpus can never evict the sentence table).
  */
private[operators] final class PlanCache(maxEntries: Int = 4) {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.LinkedHashMap[Any, DataFrame]]())

  /** The cached frame for (`input`'s canonical plan, `params`), built and
    * persisted via `build` on first use. `build` must be a pure function
    * of (input, params) — the cache makes it at-most-once per session.
    */
  def getOrMaterialize(input: DataFrame, params: Any)
      (build: => DataFrame): DataFrame = {
    val spark = input.sparkSession
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.mutable.LinkedHashMap.empty
        cache.put(spark, m)
      }
      m
    }
    val key = (input.queryExecution.analyzed.canonicalized, params)
    perSession.synchronized {
      perSession.getOrElseUpdate(key, {
        if (perSession.size >= maxEntries) {
          val (oldKey, oldDf) = perSession.head
          perSession.remove(oldKey)
          oldDf.unpersist(blocking = false)
        }
        build.persist(StorageLevel.MEMORY_AND_DISK)
      })
    }
  }
}
