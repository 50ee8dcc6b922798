package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities — the shuffle-discipline toolbox for the
  * 100 TB case (SURVEY §7.2-M6: "salting for skewed keys like B3's
  * constant key").
  *
  * The reference's stage-2 Condorcet job funnels ALL data through one key
  * (`mj_exe/maple_vote_two.go:10-21` prefixes every line with "1") — the
  * canonical skew pathology: one reducer does the whole job. Catalyst's
  * partial aggregation already defuses that for algebraic aggregates;
  * [[saltedAgg]] is the general two-phase form for when a grouping key's
  * value distribution is pathological and the aggregate is algebraic
  * (sum/count/min/max — anything with a merge step).
  */
object Skew {

  /** Two-phase salted sum-aggregation: phase 1 groups on
    * (key, salt = row-position mod saltBuckets) so a hot key's rows spread
    * over `saltBuckets` reducers; phase 2 merges the per-salt partials.
    * Output is identical to `df.groupBy(keys).agg(sum...)` — the salt is
    * internal, and because it cancels in phase 2 its assignment needs no
    * cross-run stability (a content hash would collapse IDENTICAL
    * duplicate rows of the hot key into one salt bucket — exactly the
    * constant-key count/sum workload the salt exists for). The positional
    * salt is a nondeterministic expression, so its map stage is
    * INDETERMINATE: on a fetch failure Spark rolls the whole stage back
    * and re-runs it (SPARK-23243) rather than mixing attempts —
    * correctness holds, at the cost of wider retries. Use when AQE skew
    * handling isn't enough (e.g. a single key holding >10% of rows).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Broadcast the heavy hitters, shuffle the rest: split a join on
    * whether the left key is in `hotKeys` (a small driver-known set),
    * broadcast-join the hot slice (no shuffle of the hot rows), shuffle-
    * join the cold remainder, union. Equivalent to a plain inner join.
    */
  def skewSplitJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any]): DataFrame = {
    val hotLit: Seq[Column] = hotKeys.map(lit)
    val hotL = left.filter(col(key).isin(hotLit: _*))
    val coldL = left.filter(!col(key).isin(hotLit: _*))
    val hotR = right.filter(col(key).isin(hotLit: _*))
    hotL.join(broadcast(hotR), key).unionByName(coldL.join(right, key))
  }

  /** Persist both sides bucketed by the join key so subsequent joins are
    * exchange-free (co-located): `bucketBy` pre-shuffles once at write
    * time; every later join on `key` reads co-partitioned buckets. This is
    * the "pay the shuffle once, reuse forever" pattern for fact-fact joins
    * repeated across a pipeline. Tables land in the session catalog
    * (`spark.sql.warehouse.dir`).
    */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int = 32): DataFrame = {
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }
}
