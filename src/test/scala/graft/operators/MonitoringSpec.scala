package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MonitoringSpec extends AnyFunSuite with SparkTestSession {

  test("observed: metrics ride the action, match independent counts") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (4L, Option("a"))).toDF("id", "v")
    val (instrumented, obs) = Monitoring.observed(df, "q", Seq("id", "v"))
    val n = instrumented.count() // the ONE action; metrics piggyback
    assert(n === 4L)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("id_nulls") === 0L)
    assert(m("v_nulls") === 1L)
    // HLL++ is exact at this cardinality
    assert(m("id_approx_distinct") === 4L)
    assert(m("v_approx_distinct") === 2L)
  }

  test("observed on a gated query costs no second scan and sees its rows") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val (instrumented, obs) = Monitoring.observed(docs, "docs", Seq("doc_id", "lang"))
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] === docs.count())
    assert(m("doc_id_nulls") === 0L)
  }

  test("corpusCard matches independently computed corpus facts") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val rows = docs.select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val card = Monitoring.corpusCard(docs).head()
    assert(card.getLong(0) === rows.length.toLong)
    assert(card.getLong(1) ===
      rows.map(_._3.trim.split("\\s+").length.toLong).sum)
    assert(card.getLong(2) === rows.map(_._1).distinct.length.toLong)
    assert(card.getLong(3) === rows.map(_._2).distinct.length.toLong)
    val uniq = rows.map(_._3).distinct.length.toLong
    assert(card.getLong(4) === uniq)
    assert(card.getDouble(5) ===
      BigDecimal(1.0 - uniq.toDouble / rows.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
