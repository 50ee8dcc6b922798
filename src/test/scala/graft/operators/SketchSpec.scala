package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates vs exact answers: sketches trade bounded error
  * for constant memory; the bound is the contract. The gated q18 output
  * carries each sketch's error-bound VERDICT (booleans the DuckDB
  * oracle asserts TRUE); here the underlying sketches are additionally
  * bounded TIGHTER against independently computed exact answers.
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("q18 gated output: exact companions match, every verdict true") {
    val rows = Relational.q18Sketches(spark, dir).collect()
    assert(rows.length === 5)
    val events = graft.Engine.Tables(spark, dir).events
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) === exact(t)._1, s"$t n_users")
      assert(r.getBoolean(2), s"$t approx_users_ok")
      assert(r.getBoolean(5), s"$t p50_approx_ok")
      assert(r.getBoolean(6), s"$t p99_approx_ok")
    }
  }

  test("q18 exact nearest-rank quantiles sit at their integer ranks") {
    val got = Relational.q18Sketches(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val events = graft.Engine.Tables(spark, dir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(got.keySet === events.keySet)
    events.foreach { case (t, sorted) =>
      val n = sorted.length
      val (p50, p99) = got(t)
      assert(p50 === sorted(((n + 1) / 2) - 1), s"$t p50 nearest-rank")
      assert(p99 === sorted(((99 * n + 99) / 100) - 1), s"$t p99 nearest-rank")
    }
  }

  test("sketches stay within TIGHT error bounds of exact answers") {
    val events = graft.Engine.Tables(spark, dir).events
    val sk = events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("a50"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("a99"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(sk.keySet === exact.keySet)
    sk.foreach { case (k, (users, p50, p99)) =>
      val (eu, e50, e99) = exact(k)
      assert(math.abs(users - eu).toDouble / eu < 0.05, s"$k HLL: $users vs $eu")
      // t-digest with accuracy 1000 on ~2000 rows/group: generous bounds
      assert(math.abs(p50 - e50) / math.max(math.abs(e50), 1.0) < 0.05, s"$k p50: $p50 vs $e50")
      assert(math.abs(p99 - e99) / math.max(math.abs(e99), 1.0) < 0.05, s"$k p99: $p99 vs $e99")
    }
  }
}
