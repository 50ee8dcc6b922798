package graft.operators

import graft.Engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the "cut the shuffled corpus into
  * fixed-token-budget shards" step at the tail of a training-data
  * pipeline: documents are laid out in a deterministic shuffled order,
  * token counts accumulate, and a document whose running total crosses
  * `k·budget` starts shard k. Pure function of the data (order key is
  * md5(salt ++ doc_id)), so the same corpus packs into the same shards
  * on any cluster.
  *
  * The naive formulation is `sum(tok) OVER (ORDER BY skey)` — a GLOBAL
  * ordered window, which Spark executes as a single task holding the
  * whole corpus: a non-starter at 100 TB. This runs the textbook
  * two-level distributed prefix sum instead, with a twist that keeps it
  * deterministic: the partition id is the FIRST HEX BYTE of the md5
  * order key itself (256 buckets), so bucket order == global key order
  * by construction — range partitioning with no sampled boundaries, no
  * `spark_partition_id()` nondeterminism, nothing to re-plan.
  *
  *   1. per-bucket running sums — 256 balanced ordered windows (md5
  *      bytes are uniform, each holds ~1/256 of the corpus);
  *   2. per-bucket totals → exclusive prefix offsets via an ordered
  *      window over just 256 rows (trivial at any corpus size);
  *   3. broadcast-join offsets back; global cumsum = local + offset.
  *
  * Fully lazy — no driver-side collect — and every stage is bounded:
  * the only global ordered window in the plan touches 256 rows.
  */
object Packing {

  /** Per-shard packing summary: shard id, documents packed into it and
    * their total token count. `docs` needs (doc_id, text).
    */
  def packShards(docs: DataFrame, budget: Long,
      salt: String = "pack:"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val tok = size(split(trim(col("text")), "\\s+")).cast("long")
    val skey = md5(concat(lit(salt), col("doc_id").cast("string")))
    val base = docs
      .select(col("doc_id"), tok.as("tok"), skey.as("skey"))
      .withColumn("pid", conv(substring(col("skey"), 1, 2), 16, 10).cast("int"))
      // pid is never null in practice; filtering explicitly puts the
      // SAME isnotnull(pid) the inner join pushes into branch A into
      // branch B too, so the two pid-exchange subtrees canonicalize
      // equal and ReuseExchange reads the corpus once
      .filter(col("pid").isNotNull)
    val withLocal = base.withColumn("cum_local",
      sum(col("tok")).over(
        Window.partitionBy(col("pid")).orderBy(col("skey"), col("doc_id"))))
    // bucket totals come from the WINDOWED frame (a bucket's total = its
    // max running sum), not from re-aggregating `base`: both branches
    // then share the scan→tokenize→md5→shuffle(pid) subtree, which Spark
    // reuses (ReusedExchange) instead of reading the corpus twice.
    val offsets = withLocal
      .groupBy(col("pid")).agg(max(col("cum_local")).as("ptot"))
      .withColumn("poff", coalesce(
        sum(col("ptot")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("pid"), col("poff"))
    withLocal
      .join(broadcast(offsets), "pid")
      // shard of a doc = how many full budgets precede its first token
      .withColumn("shard_id",
        expr(s"(cum_local + poff - tok) div $budget"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("shard_id"))
  }

  def packShardsDocs(spark: SparkSession, dir: String,
      budget: Long = 512L): DataFrame =
    packShards(Tables(spark, dir).documents, budget)
}
