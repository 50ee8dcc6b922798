package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkTestSession {

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map(b => f"$b%02x").mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** Independent in-memory reference: same synthesis + same integer
    * micro-unit damped iteration, computed sequentially.
    */
  private def refRanks(ids: Seq[Long], iters: Int): Map[Long, Long] = {
    val lo = ids.min
    val n = ids.size
    val edges = ids.flatMap(src => (1 to Graph.OutDegree).map(j =>
      src -> (lo + math.floorMod(h60(s"edge:$src:$j"), n.toLong))))
    var r = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => r(src) / Graph.OutDegree }.sum)
      r = ids.map(id =>
        id -> (Graph.BaseMicro + 85L * in.getOrElse(id, 0L) / 100L)).toMap
    }
    r
  }

  test("pageRank matches the sequential integer reference on real docs") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = refRanks(ids, Graph.Iterations)
    val got = Graph.pageRank(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // damping conserves mass up to floor losses: Σ rank stays within
    // [0.97·n·1e6, n·1e6] after any number of iterations
    val total = got.values.sum
    assert(total <= ids.size * 1000000L)
    assert(total >= (ids.size * 1000000L * 97) / 100)
    // the graph structure must actually differentiate ranks
    assert(got.values.toSet.size > 1)
  }

  test("pageRank is invariant to input partitioning") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val a = Graph.pageRank(docs).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Graph.pageRank(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a === b)
  }

  test("linkEdges targets stay inside the id domain, out-degree uniform") {
    import spark.implicits._
    val docs = Seq.tabulate(40)(i => (i + 100L, s"doc $i"))
      .toDF("doc_id", "text")
    val edges = Graph.linkEdges(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length === 40 * Graph.OutDegree)
    assert(edges.forall { case (_, d) => d >= 100L && d < 140L })
    assert(edges.groupBy(_._1).values.forall(_.length === Graph.OutDegree))
  }
}
