package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * seed-stable only for a fixed partitioning — repartition the input and
  * the sample changes, which poisons reproducibility of a data recipe.
  * Hash-gating on a stable key makes the sample a pure function of the
  * DATA: the same rows are selected on any cluster, any partitioning,
  * any engine that agrees on xxhash64. It is also the only sampler that
  * composes with incremental ingestion (a row's membership never changes
  * as the corpus grows).
  */
object Sampling {

  private val Buckets = 1_000_000L

  private def gate(keyCol: Column, fraction: Double, salt: String): Column =
    pmod(xxhash64(lit(salt), keyCol), lit(Buckets)) <
      (lit(Buckets) * lit(fraction)).cast("long")

  /** Keep ~`fraction` of rows, chosen by hash of `keyCol`. `salt` yields
    * independent samples from the same corpus (train/eval splits: gate on
    * disjoint salts, membership provably disjoint per salt).
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    df.filter(gate(col(keyCol), fraction, salt))
  }

  /** Per-stratum fractions (e.g. language-balanced corpus sampling):
    * strata absent from the map are dropped, matching
    * `DataFrameStatFunctions.sampleBy` semantics but deterministic in the
    * data rather than in a seed + partitioning.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], salt: String = ""): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions outside [0,1]")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(lit(salt), col(keyCol)), lit(Buckets)) <
      (lit(Buckets) * frac).cast("long"))
  }
}
