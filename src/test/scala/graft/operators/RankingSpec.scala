package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite with SparkTestSession {

  test("distributedNtile equals the single-window NTILE definition") {
    val q = TextAnalysis.qualityScore(spark, "/root/testdata/sf0.001")
    val got = Ranking.distributedNtile(q, "quality", "doc_id", 10)
      .select("doc_id", "rank", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.orderBy(col("quality"), col("doc_id"))
    val ref = q
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("bin", ntile(10).over(w))
      .select("doc_id", "rank", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("distributedNtile: N < k degenerates to one row per bucket") {
    import spark.implicits._
    val small = Seq((1L, 0.5), (2L, 0.2), (3L, 0.9)).toDF("id", "v")
    val out = Ranking.distributedNtile(small, "v", "id", 10)
      .select("id", "rank", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((2L, 1L, 1), (1L, 2L, 2), (3L, 3L, 3)))
  }

  test("distributedNtile: NULL values are kept and rank last (NULLS LAST)") {
    import spark.implicits._
    val df = Seq(1L -> Option(0.5), 2L -> Option.empty[Double],
      3L -> Option(0.1), 4L -> Option.empty[Double]).toDF("id", "v")
    val out = Ranking.distributedNtile(df, "v", "id", 2)
      .select("id", "rank", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((3L, 1L, 1), (1L, 2L, 1), (2L, 3L, 2), (4L, 4L, 2)))
  }

  test("distributedNtile: heavy value ties split across buckets like NTILE") {
    import spark.implicits._
    // 7 rows, 4 of them the same value, k=3: buckets must hold 3,2,2
    val df = Seq(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 0.5,
      5L -> 0.1, 6L -> 0.9, 7L -> 0.2).toDF("id", "v")
    val bins = Ranking.distributedNtile(df, "v", "id", 3)
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bins === Map(1 -> 3L, 2 -> 2L, 3 -> 2L))
  }
}
