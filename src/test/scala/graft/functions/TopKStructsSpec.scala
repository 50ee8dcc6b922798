package graft.functions

import graft.SparkTestSession
import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded top-k aggregate vs the ranking-window spelling it replaces:
  * same rows, same ranks, on randomized multi-partition input (so the
  * partial/merge/serialize paths all run), plus the loud-k contract.
  */
class TopKStructsSpec extends AnyFunSuite with SparkTestSession {

  test("topKPerKey equals the row_number window spelling (seeded, multi-partition)") {
    import spark.implicits._
    val rng = new scala.util.Random(0xBEEF)
    // ~40 keys × ~100 rows, duplicate scores on purpose so the id tiebreak
    // is load-bearing; 13 partitions so map-side partials must merge.
    val rows = Seq.tabulate(4000) { i =>
      (rng.nextInt(40).toLong, i.toLong, rng.nextInt(25) / 10.0)
    }
    val df = rows.toDF("key", "id", "score").repartition(13)
    for (k <- Seq(1, 3, 10)) {
      val win = Window.partitionBy(col("key"))
        .orderBy(col("score").desc, col("id"))
      val expected = df.withColumn("rk", row_number().over(win))
        .filter(col("rk") <= k)
        .select("key", "rk", "id", "score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val got = Ranking.topKPerKey(df, Seq("key"),
          struct(col("score"), (-col("id")).as("nid")), k)
        .select(col("key"), col("rk"), (-col("item.nid")).as("id"),
          col("item.score").as("score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("groups smaller than k emit all rows; all-null groups emit nothing") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", Some(2.0), 2L),
      ("b", None, 3L), ("b", None, 4L)).toDF("key", "score", "id")
      // a null score nulls the whole struct (null field → null struct is
      // NOT Spark semantics — struct(null) is a struct with a null field,
      // which IS orderable and sorts smallest). Model the "skip nulls"
      // contract the way callers do: rank only scoreable rows.
      .withColumn("ordered",
        when(col("score").isNotNull, struct(col("score"), (-col("id")).as("nid"))))
    val out = df.groupBy("key")
      .agg(TopKStructs.topkStructs(col("ordered"), 5).as("top"))
      .select(col("key"), size(col("top")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out === Map("a" -> 2, "b" -> 0))
  }

  test("non-literal or non-positive k fails at ANALYSIS time, not task time") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("key", "score")
    // checkInputDataTypes enforces the bounded-buffer contract, so the
    // failure must be an AnalysisException raised by .agg ITSELF —
    // before any job runs — never a task failure at collect().
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("key")
        .agg(TopKStructs.topkStructs(struct(col("score")), 0).as("t"))
    }
    assert(bad.getMessage.contains("positive int"))
    val nonLit = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("key")
        .agg(call_function("topk_structs", struct(col("score")), col("key")).as("t"))
    }
    assert(nonLit.getMessage.toLowerCase.contains("foldable"))
  }

  test("q7 twin: aggregate and window spellings agree on real orders") {
    val agg = graft.operators.Relational
      .topkAggOrders(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val win = graft.operators.Relational
      .q7TopOrdersPerCustomer(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(agg.nonEmpty)
    assert(agg === win)
  }

  test("sort-based aggregation fallback: serde round-trips the heap buffers") {
    // ObjectHashAggregate falls back to sort-based aggregation past the
    // per-partition key threshold, which forces every heap buffer
    // through serialize/deserialize mid-aggregation (not only at the
    // exchange). Pin that path explicitly with the threshold floored —
    // production hits it on any high-cardinality key (topk_agg's 300k
    // customers), so it must not depend on fixture cardinality.
    val s = spark.newSession()
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    import s.implicits._
    val rng = new scala.util.Random(0xFA11BACC)
    val rows = Seq.tabulate(3000) { i =>
      (rng.nextInt(100).toLong, i.toLong, rng.nextInt(20) / 10.0)
    }
    val df = rows.toDF("key", "id", "score").repartition(7)
    val got = graft.operators.Ranking.topKPerKey(df, Seq("key"),
        struct(col("score"), (-col("id")).as("nid")), 5)
      .select(col("key"), col("rk"), (-col("item.nid")).as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val expected = df.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= 5).select("key", "rk", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
  }
}
