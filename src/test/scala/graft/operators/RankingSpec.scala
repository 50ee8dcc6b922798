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

  test("distributedNtile fails fast past the distinct-value bound") {
    import spark.implicits._
    // 1000 distinct raw doubles against a bound of 100: must raise the
    // documented error, not degrade into an unbounded window + broadcast
    val wide = (0L until 1000L).map(i => (i, i / 997.0)).toDF("id", "v")
    // consume `rank` — a bare count() prunes the rank computation (and
    // with it the hazardous window + broadcast), which is exactly when
    // the guard doesn't need to fire
    val ex = intercept[Exception] {
      Ranking.distributedNtile(wide, "v", "id", 10, maxDistinctValues = 100L)
        .agg(max("rank")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("distributedNtile")), ex.toString)
    // the same data passes under the default bound
    val ok = Ranking.distributedNtile(wide, "v", "id", 10)
      .agg(max("rank")).collect()
    assert(ok.head.getLong(0) === 1000L)
  }

  test("bucketedTopK: an input rk column is rankable and overwritten, not dropped") {
    import spark.implicits._
    // `rk` is a reserved OUTPUT name — but an input carrying one must be
    // visible to orderCols (here: rank BY the pre-existing rk) and only
    // replaced in the result, never silently lost before ranking
    val df = (1L to 40L).map(i => (i, 41L - i)).toDF("id", "rk")
    val grouped = Ranking.bucketedTopK(df,
        groupCols = Seq.empty, orderCols = Seq(col("rk").asc, col("id")),
        k = 3, bucketKeys = Seq(col("id")), buckets = 4)
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // smallest input rk values are 1,2,3 at ids 40,39,38 → output rk re-ranks them
    assert(grouped === Set((40L, 1), (39L, 2), (38L, 3)))
    val byGroup = Ranking.bucketedTopK(
        df.withColumn("g", col("id") % 2), groupCols = Seq(col("g")),
        orderCols = Seq(col("rk").asc, col("id")),
        k = 2, bucketKeys = Seq(col("id")), buckets = 4)
      .select("g", "id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(byGroup === Set((0L, 40L, 1), (0L, 38L, 2), (1L, 39L, 1), (1L, 37L, 2)))
  }

  test("curriculumOrder: NULL key fails loud instead of dropping rows") {
    import spark.implicits._
    val df = Seq((Option(1L), 1), (Option.empty[Long], 2), (Option(3L), 1))
      .toDF("doc_id", "bin")
    val ex = intercept[Exception] {
      Ranking.curriculumOrder(df, "bin", "doc_id").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("curriculumOrder")), ex.toString)
  }

  test("curriculumOrder equals a single-window reference, repartition-stable") {
    import spark.implicits._
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val rows = (0L until 500L).map(i => (i, (i % 7 + 1).toInt))
    val expected = rows
      .sortBy { case (id, bin) => (-bin, md5("curr42:" + id), id) }
      .zipWithIndex.map { case ((id, bin), i) => (id, bin, i + 1L) }.toSet
    Seq(1, 7, 32).foreach { parts =>
      val df = rows.toDF("doc_id", "bin").repartition(parts)
      val got = Ranking.curriculumOrder(df, "bin", "doc_id")
        .select("doc_id", "bin", "train_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === expected, s"mismatch at $parts partitions")
    }
  }

  test("curriculumOrder: ranks are a 1..N permutation, phases contiguous") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, (i % 3 + 1).toInt)).toDF("doc_id", "bin")
    val got = Ranking.curriculumOrder(df, "bin", "doc_id")
      .select("bin", "train_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).sorted.toSeq === (1L to 300L))
    // every higher bin fully precedes every lower bin
    val maxByBin = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(maxByBin(3).max < maxByBin(2).min)
    assert(maxByBin(2).max < maxByBin(1).min)
  }
}
