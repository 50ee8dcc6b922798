package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with SparkTestSession {

  test("kmeans recovers well-separated clusters exactly (3 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 3) {
      val r = new scala.util.Random(600 + seed)
      val dim = 8
      // 3 centers far apart; points jittered a little around each
      val centers = Seq.tabulate(3)(c => Array.fill(dim)(c * 100.0 + r.nextDouble()))
      val pts = (0 until 90).map { i =>
        val c = i % 3
        (i.toLong, centers(c).map(x => (x + r.nextDouble() * 0.1).toFloat).toSeq, c)
      }
      val df = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
      val (assign, cents) = Clustering.kmeans(df, k = 3, iters = 4)
      assert(cents.length === 3)
      val got = assign.select("vec_id", "cluster")
        .as[(Long, Int)].collect().toMap
      // same true center => same predicted cluster, different => different
      val byTrue = pts.groupBy(_._3).view.mapValues(_.map(p => got(p._1)).toSet)
      byTrue.foreach { case (c, preds) =>
        assert(preds.size === 1, s"seed=$seed true cluster $c split: $preds")
      }
      assert(byTrue.values.flatten.toSet.size === 3, s"seed=$seed clusters merged")
    }
  }

  test("kmeans inertia never increases across iterations") {
    val vecs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").embeddings
    def inertia(iters: Int): Double = {
      val (a, _) = Clustering.kmeans(vecs, k = 8, iters = iters)
      a.agg(sum(col("dist2"))).head.getDouble(0)
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + 1e-6, s"inertia rose: $i1 -> $i3")
  }

  test("gated assignment covers every vector exactly once") {
    val dir = "/root/testdata/sf0.001"
    val out = Clustering.kmeansAssign(spark, dir)
    val n = graft.Engine.Tables(spark, dir).embeddings.count()
    assert(out.count() === n)
    assert(out.select("vec_id").distinct.count() === n)
    val k = out.select("cluster").distinct.count()
    assert(k >= 2 && k <= 16)
  }
}
