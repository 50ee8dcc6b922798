package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-surface hygiene: the driver treats a `queries` entry WITHOUT an
  * `oracleSql` entry as a weaker rows-only check, so a typo'd oracle key
  * would silently downgrade a gate. Pin the mapping.
  */
class SparkEntrySpec extends AnyFunSuite {

  /** The three deliberately rows-only queries, each with its reason
    * documented at the oracle map (float/sketch portability).
    */
  private val declaredRowsOnly =
    Set("kmeans_assign", "mm_features", "q18_sketches")

  test("every oracle key names a real query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-gated unless declared rows-only") {
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated === declaredRowsOnly,
      s"silently rows-only: ${ungated -- declaredRowsOnly}; " +
        s"stale declaration: ${declaredRowsOnly -- ungated}")
  }

  test("oracle SQL strings are non-empty") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
    }
  }
}
