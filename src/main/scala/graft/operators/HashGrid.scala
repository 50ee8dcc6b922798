package graft.operators

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** The keyed-hash grid every deterministic gate constant derives from:
  * floorMod(xxhash64(key, seed 42), mod)/mod − 0.5. One definition so
  * the cross-engine bit-identity argument (the value is data-independent,
  * reproducible from the key alone, and — at mod 1024 — an exact dyadic
  * double whose decimal form parses back bit-identical in DuckDB) lives
  * in one place for [[Clustering.fixedCentroids]],
  * [[Similarity.planeWeights]], [[Similarity.pqCodebooks]] and
  * [[Retrieval.queryVector]].
  */
object HashGrid {

  /** mod = 1024 (the default) keeps every point an exact dyadic rational:
    * its square and small sums of squares stay exact in double, which is
    * what lets oracle SQL interpolate the decimals verbatim. The 1e6 grid
    * (planeWeights) trades that for finer resolution where only the SIGN
    * of a dot product matters.
    */
  def point(key: String, mod: Long = 1024L): Double =
    bucket(key, mod).toDouble / mod - 0.5

  /** The raw keyed bucket in [0, mod) — for discrete derivations (sign
    * patterns, categorical picks) where [[point]]'s affine map to
    * [-0.5, 0.5) would just be undone.
    */
  def bucket(key: String, mod: Long): Long = {
    val s = UTF8String.fromString(key)
    val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    Math.floorMod(h, mod)
  }
}
