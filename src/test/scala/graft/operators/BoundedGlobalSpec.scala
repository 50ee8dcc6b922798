package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BoundedGlobal contract: exact window-equivalent values under the
  * stated bound, a LOUD failure past it — the property that replaced
  * every unpartitioned WindowExec in the library (PlanSpec pins their
  * absence; this pins the replacement's semantics).
  */
class BoundedGlobalSpec extends AnyFunSuite with SparkTestSession {

  test("prefix sums and row numbers equal their window definitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((3L, 10L), (1L, 5L), (2L, 7L), (5L, 1L), (4L, 2L))
      .toDF("k", "v")
    val incl = BoundedGlobal.withPrefixSum(df, Seq(col("k")), "v", "cum",
      includeCurrent = true, maxRows = 10, "spec")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val excl = BoundedGlobal.withPrefixSum(df, Seq(col("k")), "v", "before",
      includeCurrent = false, maxRows = 10, "spec")
      .select("k", "before").as[(Long, Long)].collect().toMap
    val rn = BoundedGlobal.withRowNumber(df, Seq(col("v").desc), "rk",
      maxRows = 10, "spec")
      .select("k", "rk").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("k"))
    val wantIncl = df.withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val wantExcl = df.withColumn("b", coalesce(sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "b").as[(Long, Long)].collect().toMap
    val wantRn = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc)).cast("long"))
      .select("k", "rk").as[(Long, Long)].collect().toMap
    assert(incl === wantIncl)
    assert(excl === wantExcl)
    assert(rn === wantRn)
  }

  test("keyed prefix sum equals the partitioned window, resets per key") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 5L), ("a", 3L, 7L),
      ("b", 1L, 2L), ("b", 2L, 1L), ("c", 9L, 4L))
      .toDF("g", "k", "v")
    val got = BoundedGlobal.withKeyedPrefixSum(df, Seq("g"),
        Seq(col("g"), col("k")), "v", "cum",
        includeCurrent = true, maxRows = 10, "spec keyed")
      .select("g", "k", "cum").as[(String, Long, Long)].collect()
      .map { case (g, k, c) => (g, k) -> c }.toMap
    val want = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "k", "cum").as[(String, Long, Long)].collect()
      .map { case (g, k, c) => (g, k) -> c }.toMap
    assert(got === want)
    // exclusive flavor: first row of each key reads 0
    val excl = BoundedGlobal.withKeyedPrefixSum(df, Seq("g"),
        Seq(col("g"), col("k")), "v", "before",
        includeCurrent = false, maxRows = 10, "spec keyed")
      .select("g", "k", "before").as[(String, Long, Long)].collect()
      .map { case (g, k, c) => (g, k) -> c }.toMap
    assert(excl(("a", 1L)) === 0L && excl(("b", 1L)) === 0L && excl(("c", 9L)) === 0L)
    assert(excl(("a", 3L)) === 15L)
  }

  test("exceeding the row bound fails loudly, naming the call site") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").withColumn("k", col("v"))
    val e = intercept[Exception] {
      BoundedGlobal.withPrefixSum(df, Seq(col("k")), "v", "cum",
        includeCurrent = true, maxRows = 50, "spec bound").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("BoundedGlobal[spec bound]"), msg)
  }
}
