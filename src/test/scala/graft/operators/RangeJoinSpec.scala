package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  test("bucketed join equals the naive range predicate, incl. boundaries") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0),
      (5L, 39.999), (6L, 40.0), (7L, -5.0), (8L, 100.0))
      .toDF("pt_id", "v")
    // intervals: closed [lo, hi]; spans of 0, 1 and many buckets; one
    // crossing zero (negative lo exercises floor-division bucketing)
    val ivs = Seq((10L, 10.0, 10.0), (11L, 0.0, 15.0), (12L, -10.0, 45.0),
      (13L, 90.0, 95.0)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "v", "lo", "hi",
        bucketWidth = 10.0)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs,
        points("v") >= ivs("lo") && points("v") <= ivs("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    // spot truths: boundary point 10.0 matches both the degenerate
    // [10,10] and [0,15]; the negative point only the zero-crossing span
    assert(got.contains((3L, 10L)) && got.contains((3L, 11L)))
    assert(got.filter(_._1 == 7L).map(_._2) === Set(12L))
    assert(!naive.exists(_._1 == 8L))
  }

  test("gated rollup equals the naive join on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = RangeJoin.rangeJoinEvents(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = graft.Engine.Tables(spark, dir).events
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expect = ev.filter(e => e._1 % 50 == 0 && e._1 < 1000).map { case (iv, v) =>
      val hits = ev.filter(e => e._2 >= v - 40 && e._2 <= v + 40)
      iv -> ((hits.length.toLong, hits.map(_._1).min, hits.map(_._1).max))
    }.toMap
    assert(got === expect)
  }

  test("the plan is an equi-join on buckets — no cartesian, no BNLJ") {
    val df = RangeJoin.rangeJoinEvents(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
