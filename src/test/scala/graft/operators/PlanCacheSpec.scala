package graft.operators

import graft.SparkTestSession
import org.apache.spark.scheduler.SparkListenerApplicationEnd
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Lifecycle contract of the materialized-intermediate cache: at-most-once
  * builds per (session, plan, params), session-UUID keying (no session
  * object retained), bounded eviction, the public invalidate face, and
  * the application-end hook that releases a stopped session's entries.
  */
class PlanCacheSpec extends AnyFunSpec with Matchers with SparkTestSession {

  describe("PlanCache") {
    it("builds at most once per (session, plan, params) and keys sessions apart") {
      val pc = new PlanCache(4)
      val in = spark.range(100).toDF("id")
      var builds = 0
      def get() = pc.getOrMaterialize(in, "p") {
        builds += 1; in.withColumn("x", col("id") * 2)
      }
      val a = get()
      val b = get()
      builds shouldBe 1
      assert(a eq b, "second lookup must return the same cached frame")
      // different params → separate entry
      pc.getOrMaterialize(in, "q") { builds += 1; in.withColumn("x", col("id") * 3) }
      builds shouldBe 2
      pc.entryCount(PlanCache.sessionId(spark)) shouldBe 2

      // a sibling session over the same context gets its own entries
      val s2 = spark.newSession()
      val in2 = s2.range(100).toDF("id")
      pc.getOrMaterialize(in2, "p") { in2.withColumn("x", col("id") * 2) }
      pc.entryCount(PlanCache.sessionId(s2)) shouldBe 1
      pc.entryCount(PlanCache.sessionId(spark)) shouldBe 2
      PlanCache.invalidateAll(PlanCache.sessionId(s2))
    }

    it("evicts the eldest entry (with unpersist) at the bound") {
      val pc = new PlanCache(1)
      val in = spark.range(50).toDF("id")
      val first = pc.getOrMaterialize(in, "a") { in.withColumn("x", col("id") + 1) }
      first.count()
      first.storageLevel should not be StorageLevel.NONE
      pc.getOrMaterialize(in, "b") { in.withColumn("x", col("id") + 2) }
      pc.entryCount(PlanCache.sessionId(spark)) shouldBe 1
      first.storageLevel shouldBe StorageLevel.NONE
      PlanCache.invalidateAll(PlanCache.sessionId(spark))
    }

    it("invalidate(spark) drops and unpersists every family's entries for the session") {
      val pc1 = new PlanCache(4)
      val pc2 = new PlanCache(4)
      val s = spark.newSession()
      val in = s.range(10).toDF("id")
      val c1 = pc1.getOrMaterialize(in, 1) { in.withColumn("x", col("id") + 1) }
      val c2 = pc2.getOrMaterialize(in, 2) { in.withColumn("x", col("id") + 2) }
      c1.count(); c2.count()
      PlanCache.invalidate(s)
      pc1.entryCount(PlanCache.sessionId(s)) shouldBe 0
      pc2.entryCount(PlanCache.sessionId(s)) shouldBe 0
      c1.storageLevel shouldBe StorageLevel.NONE
      c2.storageLevel shouldBe StorageLevel.NONE
      // and a post-invalidate lookup rebuilds rather than serving stale
      var rebuilt = false
      pc1.getOrMaterialize(in, 1) { rebuilt = true; in.withColumn("x", col("id") + 1) }
      rebuilt shouldBe true
      PlanCache.invalidateAll(PlanCache.sessionId(s))
    }

    it("mid-session invalidate drops caches but NEVER fires the destructive hooks") {
      // hooks destroy non-recomputable state (Skew's physical bucket
      // tables that live DataFrames still read); a re-ingest
      // invalidation must rebuild caches without tearing those down
      val s = spark.newSession()
      var hookRuns = 0
      PlanCache.addSessionEndHook(s)(() => hookRuns += 1)
      val pc = new PlanCache(4)
      val in = s.range(10).toDF("id")
      pc.getOrMaterialize(in, 1) { in.withColumn("x", col("id") + 1) }.count()
      PlanCache.invalidate(s)
      pc.entryCount(PlanCache.sessionId(s)) shouldBe 0
      hookRuns shouldBe 0
      // application end runs the hook exactly once
      PlanCache.invalidateAll(PlanCache.sessionId(s))
      hookRuns shouldBe 1
      PlanCache.invalidateAll(PlanCache.sessionId(s))
      hookRuns shouldBe 1
    }

    it("releases a stopped session's entries via the application-end hook") {
      val s = spark.newSession()
      val pc = new PlanCache(4)
      val in = s.range(10).toDF("id")
      val cached = pc.getOrMaterialize(in, 1) { in.withColumn("x", col("id") + 1) }
      cached.count()
      cached.storageLevel should not be StorageLevel.NONE
      pc.entryCount(PlanCache.sessionId(s)) shouldBe 1
      // Fire the hook the first materialization registered on the
      // context: delivering onApplicationEnd at stop() is Spark's
      // contract (the shared test context must stay up for the other
      // suites), the eviction it triggers is what this spec pins.
      PlanCache.sessionEndListener(PlanCache.sessionId(s))
        .onApplicationEnd(SparkListenerApplicationEnd(0L))
      pc.entryCount(PlanCache.sessionId(s)) shouldBe 0
      cached.storageLevel shouldBe StorageLevel.NONE
    }
  }
}
