package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-surface hygiene: the driver treats a `queries` entry WITHOUT an
  * `oracleSql` entry as a weaker rows-only check, so a typo'd oracle key
  * would silently downgrade a gate. Pin the mapping.
  */
class SparkEntrySpec extends AnyFunSuite {

  /** Queries deliberately left rows-only. EMPTY since round 10: the
    * last three holdouts gained value-level oracles (kmeans_assign via
    * the micro-quantized trainer + unrolled-iteration SQL; mm_features
    * via the integer decode histogram; q18_sketches via exact
    * companions + in-plan error-bound verdicts). Adding a name here
    * requires a documented portability reason at the oracle map.
    */
  private val declaredRowsOnly = Set.empty[String]

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
