package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared skew-proof ranking primitives. */
object Ranking {

  /** Two-phase per-group top-K: rank inside (group × `buckets` hash
    * sub-buckets of `bucketKeys`) and keep each bucket's top-K — any
    * row in the global top-K is necessarily in its bucket's top-K, since
    * the rows ahead of it in the bucket are a subset of the rows ahead
    * of it in the group — then rank the surviving ≤ buckets·K rows per
    * group for the true top-K.
    *
    * This is THE shape for per-group top-K when groups can be huge or
    * few: a single `row_number` window would put an entire group in one
    * task (a billion-page crawl domain; a whole language's n-gram
    * table), while here the heavy window is `buckets`× less skewed and
    * the exact one sees a bounded input regardless of group size.
    *
    * `orderCols` must be a TOTAL order within each group (extend it with
    * a unique key if needed) — ties would otherwise make both phases
    * nondeterministic. Appends a 1-based `rk` column (replacing any
    * existing `rk`); rows with rank > k are dropped.
    */
  def bucketedTopK(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int, bucketKeys: Seq[Column],
      buckets: Int = 64): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    require(buckets > 1, s"need > 1 bucket, got $buckets")
    val bkt = pmod(xxhash64(bucketKeys: _*), lit(buckets))
    df.withColumn("__btk_lrk", row_number().over(
        Window.partitionBy(groupCols :+ bkt: _*).orderBy(orderCols: _*)))
      .filter(col("__btk_lrk") <= k)
      .drop("__btk_lrk")
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)))
      .filter(col("rk") <= k)
  }
}
