package graft.operators

import graft.Engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64) —
  * pipeline extension (SURVEY.md §7.2-M6).
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *    set against the full corpus, compute cosine with codegen'd
  *    higher-order functions (zip_with + aggregate — no UDF), rank per
  *    query. One corpus scan, no corpus-side shuffle except the final
  *    per-query top-k.
  *  - [[lshTopK]] is the scale path: random-hyperplane LSH — each vector
  *    gets a b-bit signature from deterministic hash-derived hyperplanes;
  *    candidates come from multi-probe bucket equality, then exact rerank.
  *    At 100 TB the bucket join replaces the full scan per query batch.
  *
  * Cosine ordering uses round(cos, 4) with vec_id tiebreak so ranking is
  * reproducible across engines (floats are summed in engine-dependent
  * order; 4 decimals absorbs the reorder error while keeping rank
  * deterministic).
  */
object Similarity {

  private val dim = 64

  /** (vec_id, embedding, norm) with the L2 norm precomputed. */
  private def withNorm(vecs: DataFrame): DataFrame =
    vecs.withColumn("norm",
      sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))

  /** Exact cosine top-k for each query vector (default: the first
    * `numQueries` vec_ids, mirroring a query batch). The query side is
    * broadcast; scoring is one pass over the corpus.
    */
  def bruteForceTopK(vecs: DataFrame, numQueries: Int = 10, k: Int = 10): DataFrame = {
    val base = withNorm(vecs)
    val queries = broadcast(base
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm")))
    val scored = base
      .join(queries, col("vec_id") =!= col("q_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (col("norm") * col("q_norm")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables(spark, dir).embeddings)

  /** Approximate top-k via random-hyperplane LSH.
    *
    * Hyperplane p∈[0,bits), dim d gets a deterministic pseudo-random
    * weight from xxhash64(p·dim+d) mapped to [-0.5, 0.5) — no RNG, stable
    * across runs/engines. Signature bit p = sign(Σ_d w(p,d)·v_d).
    * Candidates = vectors sharing the full signature bucket with the
    * query (single-probe here; multi-probe = also visiting neighbor
    * buckets differing in 1 bit). Exact cosine rerank on candidates.
    * Recall is data-dependent; ScalaTest measures it against
    * [[bruteForceTopK]].
    */
  def lshTopK(vecs: DataFrame, numQueries: Int = 10, k: Int = 10,
      bits: Int = 8): DataFrame = {
    val base = withNorm(vecs)
    // signature: for each plane, dot the embedding with the hash-derived
    // hyperplane; pack sign bits into a long.
    val signed = base.withColumn("sig", expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, p) ->
          acc + IF(aggregate(sequence(0, ${dim - 1}), 0D, (a, d) ->
            a + (CAST(pmod(xxhash64(CAST(p * $dim + d AS STRING)), 1000000) AS DOUBLE) / 1000000.0 - 0.5)
              * CAST(element_at(embedding, d + 1) AS DOUBLE)) > 0D,
            shiftleft(1L, p), 0L))"""))
    val queries = broadcast(signed
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("sig").as("q_sig")))
    val candidates = signed
      .join(queries, col("sig") === col("q_sig") && col("vec_id") =!= col("q_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (col("norm") * col("q_norm")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables(spark, dir).embeddings)

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Exact formulation (broadcast-free self-join would be quadratic; at
    * scale run [[lshTopK]]-style bucketing first). The driver testdata has
    * no planted embedding near-dups (max off-diagonal cosine ≈ 0.48), so
    * the default 0.9 threshold yields an empty — but oracle-checkable —
    * result.
    */
  def nearDupPairs(vecs: DataFrame, threshold: Double = 0.9): DataFrame = {
    val base = withNorm(vecs)
    val a = base.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val b = base.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot",
        expr("aggregate(zip_with(emb_a, emb_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (col("norm_a") * col("norm_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // bound the exact-pair space for the oracle-gated query; the LSH path
    // is the unbounded-scale variant.
    nearDupPairs(t.embeddings.filter(col("vec_id") < 2000), threshold = 0.9)
  }
}
