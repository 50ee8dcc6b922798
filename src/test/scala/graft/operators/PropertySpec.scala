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

  test("DF-capped jaccard: subset of exact with identical reported values (5 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 5) {
      val r = rng(700 + seed)
      val vocab = Seq("red", "green", "blue", "fox", "dog", "cat", "owl")
      val docs = Seq.tabulate(10)(i =>
        (i.toLong, Seq.fill(14)(vocab(r.nextInt(vocab.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val exact = Dedup.jaccardPairs(docs, threshold = 0.4)
        .as[(Long, Long, Double)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      val capped = Dedup.jaccardPairs(docs, threshold = 0.4, maxDf = Some(4))
        .as[(Long, Long, Double)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      // one-sided: capped may MISS pairs, but never invents or distorts one
      capped.foreach { case (pair, jac) =>
        assert(exact.contains(pair), s"seed=$seed: capped invented $pair")
        assert(exact(pair) === jac, s"seed=$seed: value drifted for $pair")
      }
    }
  }

  test("sessionize equals a naive per-user fold on arbitrary event streams (10 seeds)") {
    import spark.implicits._
    val gapNs = 30L * 60 * 1000000000L
    for (seed <- 0 until 10) {
      val r = rng(300 + seed)
      val events = Seq.tabulate(80) { i =>
        (r.nextInt(5).toLong, i.toLong, r.nextLong(4L * gapNs).abs)
      }
      val got = Analytics.sessionize(events.toDF("user_id", "event_id", "ts"))
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // naive: sort each user's events by (ts, event_id), fold sessions
      val expect = events.groupBy(_._1).flatMap { case (uid, evs) =>
        val sorted = evs.map(e => (e._3, e._2)).sorted
        val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc @ cur :: rest, e) =>
            if (e._1 - cur.head._1 > gapNs) List(e) :: acc else (e :: cur) :: rest
          case (Nil, e) => List(List(e))
        }.reverse
        sessions.zipWithIndex.map { case (s, i) =>
          val ts = s.map(_._1)
          (uid, (i + 1).toLong, s.size.toLong,
            Math.floorDiv(ts.min, 1000L), Math.floorDiv(ts.max, 1000L))
        }
      }.toSet
      assert(got === expect, s"seed=$seed")
    }
  }

  test("exact percentile matches naive type-7 interpolation (10 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    for (seed <- 0 until 10) {
      val r = rng(400 + seed)
      val xs = Seq.fill(1 + r.nextInt(50))(r.nextInt(100).toDouble)
      val got = xs.map(("A", _)).toDF("g", "x").groupBy($"g")
        .agg(expr("percentile(x, array(0.25D, 0.5D, 0.75D))").as("q"))
        .head.getSeq[Double](1)
      def naive(p: Double): Double = {
        val s = xs.sorted
        val pos = p * (s.size - 1)
        val lo = pos.toInt
        val frac = pos - lo
        if (lo + 1 < s.size) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
      }
      assert(got === Seq(naive(0.25), naive(0.5), naive(0.75)), s"seed=$seed")
    }
  }

  test("substrDupStats invariants on arbitrary corpora (5 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 5) {
      val r = rng(500 + seed)
      val vocab = Seq("aa", "bb", "cc", "dd")
      val docs = Seq.tabulate(10)(i =>
        (i.toLong, Seq.fill(4 + r.nextInt(8))(vocab(r.nextInt(vocab.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val got = Dedup.substrDupStats(docs, k = 3)
        .as[(Long, Long, Long, Double)].collect()
      got.foreach { case (id, total, dup, frac) =>
        assert(dup >= 0 && dup <= total, s"seed=$seed doc=$id")
        assert(math.abs(frac - dup.toDouble / total) < 1e-6, s"seed=$seed doc=$id")
      }
      // a doc unioned with an exact copy of itself must become 100% dup
      val withCopy = docs.unionByName(
        docs.filter($"doc_id" === 0L).select(($"doc_id" + 100L).as("doc_id"), $"text"))
      val after = Dedup.substrDupStats(withCopy, k = 3)
        .as[(Long, Long, Long, Double)].collect()
        .map(t => t._1 -> t._4).toMap
      assert(after(0L) === 1.0 && after(100L) === 1.0, s"seed=$seed")
    }
  }

  test("semDedup survivors: subset, nonempty per cluster, threshold-monotone (3 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 3) {
      val r = rng(600 + seed)
      val vecs = Seq.tabulate(40)(i =>
        (i.toLong, Array.fill(64)(r.nextGaussian().toFloat).toSeq))
        .toDF("vec_id", "embedding")
      val all = Clustering.semDedup(vecs, tau = 0.2)
        .as[(Long, Int)].collect().toSeq
      val ids = all.map(_._1).toSet
      assert(ids.subsetOf((0L until 40L).toSet), s"seed=$seed")
      // every cluster that has ANY member keeps its minimum member (it
      // cannot be dominated by a smaller id in the same cluster)
      val assignAll = Clustering.semDedup(vecs, tau = 2.0) // τ>1: nothing pruned
        .as[(Long, Int)].collect().toSeq
      assert(assignAll.map(_._1).toSet === (0L until 40L).toSet, s"seed=$seed")
      assignAll.groupBy(_._2).foreach { case (cl, members) =>
        assert(ids.contains(members.map(_._1).min),
          s"seed=$seed cluster $cl lost its minimum member")
      }
      // raising τ can only ADD survivors
      val stricter = Clustering.semDedup(vecs, tau = 0.5)
        .as[(Long, Int)].collect().map(_._1).toSet
      assert(ids.subsetOf(stricter), s"seed=$seed")
    }
  }

  test("docPerplexity: single-doc corpora and token-count conservation (5 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 5) {
      val r = rng(700 + seed)
      val docs = Seq.tabulate(6)(i =>
        (i.toLong, Seq.fill(1 + r.nextInt(10))(
          r.alphanumeric.take(1 + r.nextInt(4)).mkString).mkString(" ")))
        .toDF("doc_id", "text")
      val got = TextAnalysis.docPerplexity(docs)
        .as[(Long, Long, Long, Double)].collect()
      val truth = docs.as[(Long, String)].collect()
        .map { case (id, t) => id -> t.trim.split("\\s+").count(_.nonEmpty).toLong }
        .toMap
      got.foreach { case (id, n, micro, ppl) =>
        assert(n === truth(id), s"seed=$seed doc=$id token count")
        assert(micro >= 0, s"seed=$seed doc=$id negative xent") // p <= 1 always
        assert(ppl >= 1.0, s"seed=$seed doc=$id ppl < 1")
      }
    }
  }

  test("fimTransform reassembles arbitrary unicode text exactly (8 seeds)") {
    import spark.implicits._
    val Fim = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    for (seed <- 0 until 8) {
      val r = rng(700 + seed)
      // hostile inputs: unicode letters, CJK, combining marks, empty-ish
      val alphabet = "abcé漢字ǘß λ"
      val docs = (0L until 30L).map { id =>
        (id + seed * 100L,
          Seq.fill(r.nextInt(40))(alphabet(r.nextInt(alphabet.length))).mkString)
      }
      val got = TextAnalysis.fimTransform(docs.toDF("doc_id", "text")).collect()
        .map(row => (row.getLong(0), row.getInt(1), row.getString(2)))
      val texts = docs.toMap
      got.foreach { case (id, t, fim) =>
        if (t == 1) fim match {
          case Fim(pre, suf, mid) =>
            assert(pre + mid + suf === texts(id),
              s"seed=$seed doc=$id FIM does not reassemble")
          case _ => fail(s"seed=$seed doc=$id transformed without markers")
        } else assert(fim === texts(id), s"seed=$seed doc=$id altered")
      }
    }
  }

  test("spanRemove: kept tokens are an order-preserving subset (8 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 8) {
      val r = rng(800 + seed)
      // small vocab → dense cross-doc 5-gram collisions
      val docs = (0L until 25L).map(id =>
        id -> Seq.fill(6 + r.nextInt(20))(s"w${r.nextInt(4)}").mkString(" "))
      val got = Dedup.spanRemove(docs.toDF("doc_id", "text")).collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3)))
      val texts = docs.toMap
      got.foreach { case (id, total, kept, clean) =>
        val orig = texts(id).split(" ")
        assert(total === orig.length.toLong, s"seed=$seed doc=$id total")
        val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ")
        assert(cleanToks.length === kept, s"seed=$seed doc=$id kept count")
        // order-preserving subsequence of the original tokens
        var i = 0
        cleanToks.foreach { t =>
          while (i < orig.length && orig(i) != t) i += 1
          assert(i < orig.length, s"seed=$seed doc=$id '$t' not a subsequence")
          i += 1
        }
      }
      // conservation: every doc with a twin (identical text) is fully cut
      val byText = docs.groupBy(_._2).filter(_._2.size >= 2).flatMap(_._2.map(_._1)).toSet
      got.foreach { case (id, total, kept, _) =>
        if (byText(id) && total >= 5)
          assert(kept === 0L, s"seed=$seed doc=$id identical twin not fully cut")
      }
    }
  }

  test("curriculumOrder: permutation rank, phase-contiguous (6 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 6) {
      val r = rng(900 + seed)
      val n = 100 + r.nextInt(200)
      val rows = (0L until n.toLong).map(i => (i, 1 + r.nextInt(5)))
      val got = Ranking.curriculumOrder(rows.toDF("doc_id", "bin"), "bin", "doc_id")
        .select("bin", "train_rank").collect()
        .map(row => (row.getInt(0), row.getLong(1)))
      assert(got.map(_._2).sorted.toSeq === (1L to n.toLong), s"seed=$seed not a permutation")
      val spans = got.groupBy(_._1).view.mapValues(v => (v.map(_._2).min, v.map(_._2).max))
      spans.toSeq.sortBy(-_._1).sliding(2).foreach {
        case Seq((hi, (_, hiMax)), (lo, (loMin, _))) =>
          assert(hiMax < loMin, s"seed=$seed bins $hi/$lo overlap")
        case _ =>
      }
    }
  }

  test("BoundedGlobal equals a naive in-memory prefix scan (10 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- 0 until 10) {
      val r = rng(700 + seed)
      val rows = r.shuffle((0L until 40L).toList)
        .map(k => (k, r.nextInt(1000).toLong))
      val df = rows.toDF("k", "v").repartition(7) // arbitrary layout
      val got = BoundedGlobal.withPrefixSum(df, Seq(col("k")), "v", "cum",
          includeCurrent = true, maxRows = 100, "property")
        .select("k", "cum").as[(Long, Long)].collect().toMap
      var acc = 0L
      val expect = rows.sortBy(_._1).map { case (k, v) =>
        acc += v; k -> acc
      }.toMap
      assert(got === expect, s"seed=$seed")
    }
  }

  test("keyed prefix sum is partitioning-invariant and equals a sequential fold (5 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- 0 until 5) {
      val r = rng(900 + seed)
      val rows = r.shuffle((for (g <- 0 until 4; k <- 0L until 12L)
        yield (s"g$g", k, r.nextInt(1000).toLong)).toList)
      val df = rows.toDF("g", "k", "v").repartition(7)
      val got = BoundedGlobal.withKeyedPrefixSum(df, Seq("g"),
          Seq(col("g"), col("k")), "v", "cum",
          includeCurrent = true, maxRows = 100, "property keyed")
        .select("g", "k", "cum").as[(String, Long, Long)].collect()
        .map { case (g, k, c) => (g, k) -> c }.toMap
      val expect = rows.groupBy(_._1).flatMap { case (g, xs) =>
        var acc = 0L
        xs.sortBy(_._2).map { case (_, k, v) => acc += v; (g, k) -> acc }
      }
      assert(got === expect.toMap, s"seed=$seed")
    }
  }

  test("deconOverlap and bpeFertility are partitioning-invariant on the fixture") {
    import org.apache.spark.sql.functions.rand
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val shuffled = docs.repartition(13).orderBy(rand(42))
    val train = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0)
    val evalD = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0)
    val a = Dedup.deconOverlap(train(docs), evalD(docs)).collect().toSeq
    val b = Dedup.deconOverlap(train(shuffled), evalD(shuffled)).collect().toSeq
    assert(a === b)
    val f1 = TextAnalysis.bpeFertility(docs, TextAnalysis.PinnedBpeMerges)
      .collect().toSeq
    val f2 = TextAnalysis.bpeFertility(shuffled, TextAnalysis.PinnedBpeMerges)
      .collect().toSeq
    assert(f1 === f2)
  }

  test("unigramEncode and hilbertStats are partitioning-invariant on the fixture") {
    import org.apache.spark.sql.functions.rand
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val a = TextAnalysis.unigramEncode(docs).collect().toSeq
    val b = TextAnalysis.unigramEncode(docs.repartition(13).orderBy(rand(7)))
      .collect().toSeq
    assert(a === b)
    val li = graft.Engine.Tables(spark, "/root/testdata/sf0.001").lineitem
    val h1 = Layout.hilbertStats(li, "l_orderkey", "l_partkey").collect().toSeq
    val h2 = Layout.hilbertStats(li.repartition(11).orderBy(rand(9)),
      "l_orderkey", "l_partkey").collect().toSeq
    assert(h1 === h2)
  }

  test("hamming distance equals the in-memory sign-mismatch count (5 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 5) {
      val r = rng(900 + seed)
      // negatives, zeros and tiny magnitudes all land in the vectors
      val vecs = (0L until 30L).map { id =>
        (id, Array.fill(64)(((r.nextDouble() - 0.5) *
          (if (r.nextInt(5) == 0) 1e-7 else 2.0)).toFloat))
      }
      val raw = vecs.toMap
      val got = Similarity.hammingTopK(vecs.toDF("vec_id", "embedding"),
        numQueries = 5, topK = 29).collect()
      def signs(v: Array[Float]): Seq[Boolean] = v.map(_ >= 0f).toSeq
      got.foreach { row =>
        val (q, c) = (row.getLong(0), row.getLong(2))
        val expect = signs(raw(q)).zip(signs(raw(c))).count(t => t._1 != t._2)
        assert(row.getLong(3) === expect.toLong, s"seed=$seed pair ($q,$c)")
      }
      // and the ranking is exactly (distance, id)-sorted per query
      got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val order = rows.sortBy(_.getInt(1)).map(r => (r.getLong(3), r.getLong(2)))
        assert(order.toSeq === order.sortBy(identity).toSeq, s"seed=$seed")
      }
    }
  }

  test("dpoPairs equals a naive best/worst selection (10 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val r = rng(1000 + seed)
      val events = (0 until 60).map { i =>
        (r.nextInt(8).toLong, i.toLong, "gen",
          (r.nextInt(5) * 0.1) + 0.1, i.toLong)
      }
      val df = events.toDF("user_id", "event_id", "event_type", "value", "ts")
      val got = Posttraining.dpoPairs(df).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      val expect = events.groupBy(_._1).flatMap { case (u, es) =>
        val scored = es.map(e => (math.floor(e._4 * 1e6).toLong, e._2))
        val ch = scored.max
        val rj = scored.min
        if (ch._1 > rj._1) Some(u -> ((ch._2, rj._2))) else None
      }
      assert(got === expect, s"seed=$seed")
    }
  }

  test("passAtK equals the BigInt binomial estimator (10 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val r = rng(1100 + seed)
      val events = (0 until 80).map { i =>
        // scores straddle the 100.0 threshold
        (r.nextInt(6).toLong, i.toLong, "gen",
          if (r.nextBoolean()) 200.0 else 1.0, i.toLong)
      }
      val df = events.toDF("user_id", "event_id", "event_type", "value", "ts")
      val got = Posttraining.passAtK(df).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(4))))
        .toMap
      def binom(n: Long, k: Long): BigInt =
        if (k > n) BigInt(0)
        else (0L until k).map(j => BigInt(n - j)).product /
          (1L to k).map(BigInt(_)).product
      events.groupBy(_._1).foreach { case (u, es) =>
        val n = es.size.toLong
        val c = es.count(_._4 >= 100.0).toLong
        val expect =
          if (n < 4) { if (c > 0) 1000000L else 0L }
          // the estimator via true binomials in BigInt — structurally
          // different from the operator's factor products, same value
          else (BigInt(1000000) -
            binom(n - c, 4) * 1000000 / binom(n, 4)).toLong
        assert(got(u) === ((n, c, expect)), s"seed=$seed user $u")
      }
    }
  }

  test("chatTruncate keeps the maximal fitting suffix (10 seeds)") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val r = rng(1200 + seed)
      val types = Seq("a", "bb", "ccc", "dddd") // varied turn lengths
      val events = (0 until 50).map { i =>
        (r.nextInt(6).toLong, i.toLong, types(r.nextInt(4)),
          r.nextInt(1000) * 0.001, i.toLong)
      }
      val budget = 20 + r.nextInt(40)
      val df = events.toDF("user_id", "event_id", "event_type", "value", "ts")
      val got = Posttraining.chatTruncate(df, budgetChars = budget).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
        .toMap
      events.groupBy(_._1).foreach { case (u, es) =>
        val turns = es.sortBy(e => (e._5, e._2))
          .map(e => s"${e._3}:${math.floor(e._4 * 1e6).toLong}")
        // naive maximal suffix: grow from the newest turn until the
        // rendered length (incl. separators) would exceed the budget
        var kept = List.empty[String]
        var done = false
        turns.reverse.foreach { t =>
          if (!done) {
            val cand = t :: kept
            if (cand.map(_.length).sum + cand.size - 1 <= budget) kept = cand
            else done = true
          }
        }
        val text = kept.mkString("|")
        assert(got(u) === ((turns.size.toLong, kept.size.toLong,
          text.length.toLong)), s"seed=$seed user $u budget $budget")
      }
    }
  }

  test("bitext mining is partitioning-invariant (5 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.rand
    for (seed <- 0 until 5) {
      val r = rng(800 + seed)
      val vecs = (0L until 40L).map { id =>
        (id, Seq.fill(8)((r.nextDouble() - 0.5).toFloat))
      }
      val df = vecs.toDF("vec_id", "embedding")
      val base = Similarity.bitextMargin(df).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
      val reparted = Similarity.bitextMargin(
        df.repartition(11).orderBy(rand(seed))).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
      assert(base === reparted, s"seed=$seed")
    }
  }
}
