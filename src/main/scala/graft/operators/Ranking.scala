package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared skew-proof ranking primitives. */
object Ranking {

  /** Per-key top-k through the bounded [[graft.functions.TopKStructs]]
    * aggregate instead of a ranking window. The window spelling
    * (`row_number OVER (PARTITION BY key ORDER BY ord) <= k`) exchanges
    * and sorts EVERY candidate row; this one is a partial/final
    * ObjectHashAggregate — each map task retains at most k rows per key
    * in a bounded heap, so the exchange carries one k-element buffer per
    * (task, key) and nothing is ever sorted (the heap drain orders the
    * survivors). At 100 TB this is the difference between shuffling the
    * full scored relation and shuffling k rows per key per task.
    *
    * `ordered` must be a struct whose natural (lexicographic) ordering
    * IS the ranking order, largest first — encode ascending fields by
    * negation and make the order total (append a unique id) or ranks are
    * nondeterministic. Output: `keyCols`, 1-based `rk`, and `item` (the
    * retained struct) — callers select `item.*` payload fields back out.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], ordered: Column,
      k: Int): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    df.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.TopKStructs.topkStructs(ordered, k).as("__tk"))
      .select(keyCols.map(col) :+
        posexplode(col("__tk")).as(Seq("__tk_pos", "item")): _*)
      .withColumn("rk", (col("__tk_pos") + 1).cast("int"))
      .drop("__tk_pos")
  }

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
    * nondeterministic. Appends a 1-based `rk` column; `rk` is a RESERVED
    * OUTPUT name: an input `rk` stays visible to `orderCols` (rank by it
    * if you like) but is overwritten in the result.
    */
  def bucketedTopK(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int, bucketKeys: Seq[Column],
      buckets: Int = 64): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    require(buckets > 1, s"need > 1 bucket, got $buckets")
    val bkt = pmod(xxhash64(bucketKeys: _*), lit(buckets))
    val pruned = df.withColumn("__btk_lrk", row_number().over(
        Window.partitionBy(groupCols :+ bkt: _*).orderBy(orderCols: _*)))
      .filter(col("__btk_lrk") <= k)
      .drop("__btk_lrk")
    // exact-rank stitch: grouped → ordinary partitioned window; global
    // (no group columns) → the input is the bucket-pruned ≤ buckets·k
    // rows, a BoundedGlobal pass (loud bound, no unpartitioned window).
    // An input `rk` column survives up to here (so orderCols may rank
    // BY it) and is only overwritten by the final withColumn — `rk` is
    // a reserved output name, never a silently dropped input.
    val ranked =
      if (groupCols.nonEmpty)
        pruned.withColumn("rk", row_number().over(
          Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)))
      else
        BoundedGlobal.withRowNumber(pruned, orderCols, "__btk_grk",
            maxRows = buckets.toLong * k, "bucketedTopK global rank")
          .withColumn("rk", col("__btk_grk").cast("int"))
          .drop("__btk_grk")
    ranked.filter(col("rk") <= k)
  }

  /** Exact global NTILE(k) over (`valueCol`, `keyCol`) ordering — WITHOUT
    * the single-task global window `ntile()` plans (the whole corpus in
    * one partition is exactly what curriculum binning at 100 TB can't
    * do). Requires a BOUNDED value domain (e.g. a quality score rounded
    * to 4 decimals → ≤ 10⁴+1 distinct values); cardinality bounds the
    * driver-side broadcast, not correctness.
    *
    * Same two-level decomposition as shard packing: a row's global rank
    * = (count of rows in strictly smaller value groups — a running sum
    * over the small distinct-values table, broadcast back) + (its
    * row_number within its value group — a window partitioned by value,
    * thousands of balanced partitions). The bucket boundaries then come
    * from SQL NTILE's exact definition: with N rows, the first N mod k
    * buckets hold ⌈N/k⌉ rows, the rest ⌊N/k⌋ — reproduced arithmetically
    * from the rank, with N = the full-frame sum over the same counts
    * table (one corpus aggregation total; the plan stays fully lazy).
    * Appends `rank` and `bin`.
    *
    * Semantics match SQL `ntile(k) OVER (ORDER BY value NULLS LAST,
    * key)`: NULL values are kept and rank after all non-NULL values.
    * `keyCol` must be unique within each value group (so that
    * (valueCol, keyCol) is a total order) — duplicate keys would make
    * rank/bin nondeterministic across runs.
    *
    * The bounded-domain precondition is ENFORCED, not assumed: more than
    * `maxDistinctValues` distinct values fails the BoundedGlobal pass
    * with a clear error instead of silently degrading into a
    * corpus-sized single-task window plus a corpus-sized broadcast (the
    * failure mode for a raw double column — quantize such columns
    * first, e.g. `round(value, 4)` as the quality gates do).
    */
  def distributedNtile(df: DataFrame, valueCol: String, keyCol: String,
      k: Int, maxDistinctValues: Long = 1000000L): DataFrame = {
    require(k > 0, s"ntile k must be positive, got $k")
    require(maxDistinctValues > 0,
      s"maxDistinctValues must be positive, got $maxDistinctValues")
    // MATERIALIZE the per-value histogram: it is consumed TWICE (the
    // global prefix pass and the totals aggregate) and without the
    // checkpoint Catalyst duplicates its whole upstream — the corpus
    // scan plus every derivation feeding `valueCol` ran once per
    // consumer (3 corpus passes for the gate; 2 after). The table is
    // domain-bounded (≤ maxDistinctValues, enforced loudly by the
    // prefix pass), so the materialization is a few MB at any corpus
    // size — the §8 "decide on small rows" shape.
    val counts0 = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__nt_cnt"))
      .localCheckpoint(true)
    val totals = counts0.agg(sum(col("__nt_cnt")).as("__nt_n"))
    val counts = BoundedGlobal.withPrefixSum(counts0,
        Seq(col(valueCol).asc_nulls_last), "__nt_cnt", "__nt_before",
        includeCurrent = false, maxRows = maxDistinctValues,
        s"distributedNtile($valueCol)")
      .crossJoin(broadcast(totals))
      .select(col(valueCol).as("__nt_v"), col("__nt_before"), col("__nt_n"))
    val r = col("__nt_before") +
      row_number().over(Window.partitionBy(col(valueCol)).orderBy(col(keyCol)))
    df.join(broadcast(counts), col(valueCol) <=> col("__nt_v"))
      .drop("__nt_v")
      .withColumn("rank", r)
      // all-integer `div` arithmetic (no doubles → no 2^53 rank ceiling);
      // when N < k the WHEN branch always fires, so the ELSE's div-by-
      // zero base is never evaluated (CASE short-circuits per row)
      .withColumn("bin", expr(
        s"""CAST(CASE
              WHEN rank <= (__nt_n % $k) * (__nt_n div $k + 1)
              THEN (rank - 1) div (__nt_n div $k + 1) + 1
              ELSE (__nt_n % $k)
                   + (rank - (__nt_n % $k) * (__nt_n div $k + 1) - 1)
                     div (__nt_n div $k) + 1
            END AS INT)"""))
      .drop("__nt_before", "__nt_n")
  }

  /** Curriculum training order: every row gets an exact global
    * `train_rank` ordering the corpus by `binCol` DESCENDING (easy/
    * high-quality phases first) with a deterministic hash-shuffled order
    * WITHIN each bin — coarse curriculum phases, shuffled inside each
    * phase, which is how length/quality curricula are actually fed to
    * trainers (strict quality order inside a phase would correlate
    * adjacent batches).
    *
    * Same two-level rank decomposition as [[distributedNtile]]/shard
    * packing, so there is NO single-task global window over the corpus:
    * a row's rank = its row_number inside (bin, pid) — pid the first
    * md5 byte, so ~256 balanced sub-windows per bin — plus the
    * broadcast prefix count of all (bin, pid) groups ahead of it in
    * curriculum order — a [[BoundedGlobal]] pass over the bins×256-row
    * offsets table (loud bound, no unpartitioned window). The order is
    * a pure function of the data (md5 of salt ++ key), reproducible on
    * any engine/partitioning — the [[Sampling.trainOrderShuffle]]
    * guarantee, with phases.
    */
  def curriculumOrder(df: DataFrame, binCol: String, keyCol: String,
      salt: String = "curr42:"): DataFrame = {
    // a NULL key would hash to a NULL skey/pid and silently drop the row
    // from the training order (train_rank no longer a 1..N permutation);
    // keys are identities, so that's a data bug — fail loud, in-row, at
    // scan time, instead of losing documents
    // MATERIALIZE the narrow (key, bin, skey, pid) proxy rows: they are
    // consumed twice (the ranking window and the per-(bin, pid) counts)
    // and the caller's upstream — the full quality-score + ntile
    // pipeline in the gate — is expensive; without the checkpoint
    // Catalyst recomputed that whole subtree once per consumer
    // (measured: 6 corpus scans in the curriculum_order plan, 2 after).
    // ~50 B/row of proxy is the §8 "shuffle metadata, not payloads"
    // trade at any scale.
    val base = df
      .withColumn("skey", md5(concat(lit(salt),
        when(col(keyCol).isNull, raise_error(lit(
          s"curriculumOrder: NULL $keyCol — rank keys must be non-null")))
          .otherwise(col(keyCol).cast("string")))))
      .withColumn("pid", conv(substring(col("skey"), 1, 2), 16, 10).cast("int"))
      .localCheckpoint(true)
    val local = base.withColumn("__cu_lrk", row_number().over(
      Window.partitionBy(col(binCol), col("pid"))
        .orderBy(col("skey"), col(keyCol))))
    // group count, not max(row_number): the same value (ranks are 1..n
    // within the group) without forcing the window ahead of the
    // aggregate — the counts side now reads the checkpoint directly
    val counts = base.groupBy(col(binCol), col("pid"))
      .agg(count(lit(1)).as("__cu_cnt"))
    // 256 pid buckets × a bounded bin domain (ntile bins / quantized
    // scores) — 1M groups is far past any sane curriculum phase count
    val offs = BoundedGlobal.withPrefixSum(counts,
        Seq(col(binCol).desc, col("pid")), "__cu_cnt", "__cu_off",
        includeCurrent = false, maxRows = 1000000L, "curriculumOrder offsets")
      .select(col(binCol).as("__cu_b"), col("pid").as("__cu_p"),
        col("__cu_off"))
    local
      .join(broadcast(offs),
        col(binCol) === col("__cu_b") && col("pid") === col("__cu_p"))
      .withColumn("train_rank", col("__cu_off") + col("__cu_lrk"))
      .drop("__cu_b", "__cu_p", "__cu_off", "__cu_lrk", "pid", "skey")
  }
}
