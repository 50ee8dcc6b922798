package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Format round-trips through the Warehouse namespace: schema'd CSV and
  * JSON reads must be lossless against the parquet source of truth.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestSession {

  private lazy val wh =
    new Warehouse(spark, java.nio.file.Files.createTempDirectory("graft-wh").toString)

  private lazy val nation =
    graft.Engine.Tables(spark, "/root/testdata/sf0.001").nation

  test("csv round-trip with explicit schema is lossless") {
    wh.saveCsv(nation, "nation_csv")
    val back = wh.readCsv("nation_csv", nation.schema)
    assert(back.schema === nation.schema)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq
      === nation.orderBy(col("n_nationkey")).collect().toSeq)
  }

  test("json round-trip with explicit schema is lossless") {
    wh.saveJson(nation, "nation_json")
    val back = wh.readJson("nation_json", nation.schema)
    assert(back.schema === nation.schema)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq
      === nation.orderBy(col("n_nationkey")).collect().toSeq)
  }
}
