package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkTestSession {

  test("q33 single-scan multiset arithmetic equals Spark's exceptAll/intersectAll") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Engine.Tables(spark, dir).lineitem
    val hi = li.filter(col("l_quantity") > 25).select(col("l_orderkey"))
    val disc = li.filter(col("l_discount") > 0.05).select(col("l_orderkey"))
    def multiset(rows: Array[Long]): Map[Long, Int] =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    val got = Relational.q33MultisetOps(spark, dir).collect()
      .groupBy(_.getString(0))
      .view.mapValues(rs => multiset(rs.map(_.getLong(1)))).toMap
    val refExcept = multiset(hi.exceptAll(disc).collect().map(_.getLong(0)))
    val refIntersect = multiset(hi.intersectAll(disc).collect().map(_.getLong(0)))
    assert(got("except_all") === refExcept)
    assert(got("intersect_all") === refIntersect)
  }

  test("q33 plan: one lineitem scan feeds both multiset branches") {
    val df = Relational.q33MultisetOps(spark, "/root/testdata/sf0.001")
    df.collect() // AQE reuse decisions only exist in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    val reused = plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(reused || scans <= 1,
      s"expected the counts aggregate to be shared (scans=$scans):\n${plan.take(3000)}")
  }
}
