package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkTestSession {

  test("saltedSum equals plain groupBy sum on a pathologically hot key") {
    import spark.implicits._
    // 10k rows on one key + a long tail — the B3 constant-key shape
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "b", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }
      .toDF("k", "v")
    val got = Skew.saltedSum(df, Seq("k"), "v")
      .as[(String, Double)].collect().toMap
    val expect = df.groupBy("k").agg(sum("v"))
      .as[(String, Double)].collect().toMap
    assert(got === expect)
  }

  test("skewSplitJoin equals a plain inner join") {
    import spark.implicits._
    val left = Seq(("hot", 1), ("hot", 2), ("cold1", 3), ("cold2", 4)).toDF("k", "lv")
    val right = Seq(("hot", 10), ("cold1", 20), ("cold3", 30)).toDF("k", "rv")
    val got = Skew.skewSplitJoin(left, right, "k", Seq("hot"))
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().toSet
    val expect = left.join(right, "k")
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().toSet
    assert(got === expect)
    assert(got === Set(("hot", 1, 10), ("hot", 2, 10), ("cold1", 3, 20)))
  }

  test("bucketized join plans without a shuffle exchange") {
    import spark.implicits._
    val orders = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("key", "o")
    val items = (1 to 3000).map(i => (((i % 1000) + 1).toLong, s"i$i")).toDF("key", "it")
    Seq("t_orders_b", "t_items_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val bo = Skew.bucketize(spark, orders, "t_orders_b", "key", buckets = 8)
    val bi = Skew.bucketize(spark, items, "t_items_b", "key", buckets = 8)
    // test data is tiny, so the planner would broadcast and skip the
    // bucketed path entirely — disable broadcast to exercise the
    // co-located sort-merge plan a fact-fact join would get at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bi, "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got plan:\n$plan")
      assert(joined.count() === 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_items_b")
    }
  }
}
