package graft

import org.apache.spark.sql.functions._

/** Calibration probe for the gridB auto-derivation
  * ([[operators.Dedup.derivedGridB]]): prints the Catalyst sizeInBytes
  * estimates the derivation reads and the true counted signature
  * volumes for the dedup verify's signature tables, per corpus dir —
  * the tool that produced the est/true ≈ 0.105 stability evidence in
  * STRESS.md (round 18) and the calibration points DedupSpec pins.
  * Re-run it (args = corpus dirs) whenever the fixture family or
  * Spark's stats estimation changes enough to threaten the
  * calibration; the derived values it implies must stay inside the
  * 50× A/B's measured-optimal band or `GridCellTargetEstBytes` needs
  * re-tuning.
  *
  *   java -cp "target/scala-2.13/classes:/opt/spark/jars/&#42;"
  *     graft.StatsProbe /root/testdata/sf0.1 /tmp/graft-rep50
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(16, "stats-probe")
    for (dir <- args) {
      val docs = Engine.Tables(spark, dir).documents
      val sh = operators.Dedup.shingleHashes(docs, 3)
      val sets = sh.groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("h"))).as("hs"),
          count(lit(1)).as("n_sh"))
      val docsEst = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      val shEst = sh.queryExecution.optimizedPlan.stats.sizeInBytes
      val setsEst = sets.queryExecution.optimizedPlan.stats.sizeInBytes
      val t0 = System.nanoTime()
      val shCount = sh.count()
      val tCount = (System.nanoTime() - t0) / 1e9
      println(s"[statsprobe] $dir docsEst=$docsEst shEst=$shEst " +
        s"setsEst=$setsEst shCount=$shCount countSec=$tCount")
    }
    spark.stop()
  }
}
