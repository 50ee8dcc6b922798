package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkTestSession {

  test("curate: end-state invariants of every stage hold at once") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Engine.Tables(spark, dir).documents
    val out = Pipeline.curateDocs(spark, dir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet

    // stage 2: the eval split never reaches the corpus
    assert(ids.forall(_ % 20 != 0))

    // stage 1: survivors are canonical — each is the MIN doc_id of its
    // content class, so no two share a text digest
    val byDigest = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val minOfClass = byDigest.groupBy(_._2).map { case (fp, xs) =>
      fp -> xs.map(_._1).min }
    val digestOf = byDigest.toMap
    assert(ids.forall(id => minOfClass(digestOf(id)) == id))

    // stage 3: every emitted score passed the admission cut
    assert(out.forall(_.getDouble(4) >= 0))

    // stage 4: every id satisfies the cur: md5 gate — and re-running
    // yields the identical set (determinism of the whole composition)
    val again = Pipeline.curateDocs(spark, dir).collect().map(_.getLong(0)).toSet
    assert(again === ids)

    // stage 2 exactness: no surviving doc shares a 5-gram with any eval doc
    val evalSh = Dedup.shingles(docs.filter(col("doc_id") % 20 === 0), 5)
      .select("shingle").distinct()
    val leaked = Dedup.shingles(
        docs.filter(col("doc_id").isInCollection(ids)), 5)
      .join(evalSh, "shingle")
    assert(leaked.count() === 0L)
  }
}
