package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property tests with fixed seeds (SURVEY §5: the pyramid
  * layer the reference never had): engine results vs naive in-memory
  * oracles on generated inputs. Plain `Random(seed)` generation — the
  * scalatest/scalacheck bridge artifact isn't on the offline classpath,
  * and determinism is a feature here.
  */
class PropertySpec extends AnyFunSuite with SparkTestSession {

  private def rng(seed: Int) = new scala.util.Random(seed)

  test("wordcount equals naive count on arbitrary corpora (10 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val r = rng(seed)
      val lines = Seq.fill(20)(
        Seq.fill(r.nextInt(8))(r.alphanumeric.take(1 + r.nextInt(5)).mkString)
          .mkString(" "))
      val got = Workloads.wordCount(lines.toDF("text"), "text")
        .as[(String, Long)].collect().toMap
      val expect = lines.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      assert(got === expect, s"seed=$seed")
    }
  }

  test("condorcet: permutation-invariant; wins sum to distinct pairs (10 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val r = rng(100 + seed)
      val ballots = Seq.fill(30) {
        val Seq(a, b, c) = r.shuffle(Seq("A", "B", "C", "D")).take(3)
        (a, b, c)
      }
      val df = ballots.toDF("c1", "c2", "c3")
      val base = Workloads.condorcetWins(df).collect().toSeq
      val perm = Workloads.condorcetWins(
        df.orderBy(org.apache.spark.sql.functions.rand(seed))).collect().toSeq
      assert(base === perm, s"seed=$seed")
      // each distinct candidate pair observed on some ballot is decided
      // exactly once → total wins == number of distinct pairs
      val pairs = ballots.flatMap { case (a, b, c) =>
        Seq(Set(a, b), Set(a, c), Set(b, c)) }.toSet
      assert(base.map(_.getLong(1)).sum === pairs.size.toLong, s"seed=$seed")
    }
  }

  test("minhash-LSH pairs are always a subset of exact jaccard pairs (5 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 5) {
      val r = rng(200 + seed)
      val vocab = Seq("red", "green", "blue", "fox", "dog")
      // tiny vocabulary → heavy shingle collisions → real candidate pairs
      val docs = Seq.tabulate(8)(i =>
        (i.toLong, Seq.fill(12)(vocab(r.nextInt(vocab.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val exact = Dedup.jaccardPairs(docs, threshold = 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLshPairs(docs, threshold = 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact), s"seed=$seed: lsh=$lsh exact=$exact")
    }
  }
}
