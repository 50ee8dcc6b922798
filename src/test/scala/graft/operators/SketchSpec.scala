package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates vs exact answers: sketches trade bounded error
  * for constant memory; the bound is the contract.
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  test("q18 sketches stay within error bounds of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val got = Relational.q18Sketches(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val events = graft.Engine.Tables(spark, dir).events
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (k, (users, p50, p99)) =>
      val (eu, e50, e99) = exact(k)
      assert(math.abs(users - eu).toDouble / eu < 0.05, s"$k HLL: $users vs $eu")
      // t-digest with accuracy 1000 on ~2000 rows/group: generous bounds
      assert(math.abs(p50 - e50) / math.max(math.abs(e50), 1.0) < 0.05, s"$k p50: $p50 vs $e50")
      assert(math.abs(p99 - e99) / math.max(math.abs(e99), 1.0) < 0.05, s"$k p99: $p99 vs $e99")
    }
  }
}
