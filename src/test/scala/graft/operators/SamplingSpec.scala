package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs =
    graft.Engine.Tables(spark, "/root/testdata/sf0.01").documents

  test("deterministic: identical membership across runs and partitionings") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(math.abs(a.size - 150) < 60, s"~30% of 500 expected, got ${a.size}")
  }

  test("different salts give independent samples; same salt is a subset chain") {
    val train = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val eval = Sampling.deterministicSample(docs, "doc_id", 0.1, salt = "eval")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same salt, smaller fraction ⊂ larger fraction (hash gate is a prefix)
    val small = Sampling.deterministicSample(docs, "doc_id", 0.2, salt = "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(train))
    // independent salts overlap at ~product rate (0.5×|eval| expected);
    // if the salt were ignored, eval ⊂ train and the intersection would
    // equal |eval| — assert strictly below that
    assert((train intersect eval).size < eval.size)
  }

  test("capPerGroup: <= k per group, repartition-stable, equals one-window reference") {
    import org.apache.spark.sql.expressions.Window
    val in = docs.select(col("doc_id"), col("source"))
    val capped = Sampling.capPerGroup(in, "source", "doc_id", 7)
    capped.groupBy("source").count().collect()
      .foreach(r => assert(r.getLong(1) <= 7, s"group ${r.getString(0)} over cap"))
    // the two-phase (bucketed) ranking must equal the naive single window
    val ref = in
      .withColumn("o", md5(concat(lit("cap:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("o"), col("doc_id"))))
      .filter(col("rk") <= 7).select("doc_id", "source", "rk")
    assert(capped.collect().toSet === ref.collect().toSet)
    // membership is a function of the data, not the partitioning
    val again = Sampling.capPerGroup(
      docs.repartition(17).select(col("doc_id"), col("source")), "source", "doc_id", 7)
    assert(again.select("doc_id").collect().map(_.getLong(0)).toSet
      === capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("disjointSplits: pairwise disjoint, jointly exhaustive, ~weighted") {
    val splits = Sampling.disjointSplits(docs, "doc_id", Seq(0.8, 0.1, 0.1))
      .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
    splits.combinations(2).foreach { case Seq(a, b) =>
      assert((a intersect b).isEmpty)
    }
    assert(splits.map(_.size).sum === docs.count())
    assert(splits.head.size > 300, s"~400 expected in the 0.8 split, got ${splits.head.size}")
  }

  test("stratified: per-language fractions respected; unlisted strata dropped") {
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 1.0))
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("en", "de")) // fr/es/zh unlisted → dropped
    assert(counts("de") === totals("de"))
    assert(math.abs(counts("en") - totals("en") * 0.5) < totals("en") * 0.25)
  }

  test("trainOrderShuffle: total order is a pure function of the data") {
    val a = Sampling.trainOrderShuffle(docs.select("doc_id"), "doc_id")
      .collect().map(_.getLong(0))
    val b = Sampling.trainOrderShuffle(docs.select("doc_id").repartition(17), "doc_id")
      .collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq) // same order at any input partitioning
    assert(a.toSet.size === a.length)
    assert(a.toSeq !== a.sorted.toSeq, "md5 order must not be key order")
  }

  test("langBalance: under-target languages keep all, over-target downsample") {
    import spark.implicits._
    val ten = "one two three four five six seven eight nine ten"
    val df = ((0L until 10L).map(i => (i, "en", ten)) :+ (100L, "fr", ten))
      .toDF("doc_id", "lang", "text")
    val kept = Sampling.langBalance(df).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // fr holds 10 of 110 tokens, target 55 -> frac clamps to 1, all kept
    assert(kept.contains((100L, "fr")))
    // en holds 100, target 55 -> frac 0.55: a strict, non-empty subset
    val en = kept.filter(_._2 == "en")
    assert(en.nonEmpty && en.length < 10, s"en kept ${en.length}")
    // deterministic under repartitioning
    val again = Sampling.langBalance(df.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.sorted.toSeq === kept.sorted.toSeq)
  }

  test("langBalance: NULL lang is its own sampled slice, not dropped") {
    import spark.implicits._
    val ten = "one two three four five six seven eight nine ten"
    val df = ((0L until 10L).map(i => (i, Option("en"), ten)) :+
      (100L, Option.empty[String], ten)).toDF("doc_id", "lang", "text")
    val kept = Sampling.langBalance(df).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    // the null slice holds 10 of 110 tokens, target 55 -> frac 1, kept
    assert(kept.contains((100L, None)), s"null-lang doc dropped: ${kept.toSeq}")
    val en = kept.filter(_._2.contains("en"))
    assert(en.nonEmpty && en.length < 10)
  }

  test("splitAssign labels agree with disjointSplits membership exactly") {
    import spark.implicits._
    val df = (0L until 500L).toDF("doc_id")
    val weights = Seq(0.8, 0.1, 0.1)
    val names = Seq("train", "val", "test")
    val labeled = Sampling.splitAssign(df, "doc_id", weights, names)
      .as[(Long, String)].collect().toMap
    // exhaustive: every row labeled with a known name
    assert(labeled.size === 500)
    assert(labeled.values.toSet.subsetOf(names.toSet))
    // agrees row-for-row with the three-frame form on the same salt
    val frames = Sampling.disjointSplits(df, "doc_id", weights, salt = "split:")
    names.zip(frames).foreach { case (n, f) =>
      f.as[Long].collect().foreach(id =>
        assert(labeled(id) === n, s"doc $id labeled ${labeled(id)}, frame says $n"))
    }
    // roughly the requested proportions
    val counts = labeled.values.groupBy(identity).view.mapValues(_.size)
    assert(counts("train") > 350 && counts("val") > 20 && counts("test") > 20)
  }

  test("weightedSample matches the per-row md5 gate and is weight-monotone") {
    import spark.implicits._
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("qw:" + id).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    val df = (0L until 400L).map(i => (i, (i % 10 + 1) / 10.0))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(df, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    // same double arithmetic as the gate: 1e6*(w) truncated, NOT the
    // exact w*1e6 integer (0.7*1e6 truncates to 699999)
    val expected = (0L until 400L)
      .filter(i => bucket(i) < (1000000L * ((i % 10 + 1) / 10.0)).toLong).toSet
    assert(kept === expected)
    // weight 1.0 rows always survive; raising every weight only adds rows
    assert((0L until 400L).filter(_ % 10 == 9).forall(kept))
    val boosted = Sampling.weightedSample(
        df.withColumn("w", least(lit(1.0), col("w") + 0.3)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(boosted))
  }

  test("dsirWeights: exact micro-nat sums vs an independent implementation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha gamma", true),   // target-flavored
      (1L, "alpha beta beta beta", true),
      (2L, "delta epsilon delta zeta", false),
      (3L, "alpha delta epsilon zeta", false))
      .toDF("doc_id", "text", "is_target")
    val got = Sampling.dsirWeights(docs, col("is_target"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent reference with the same smoothing + rounding
    val all = Seq(
      0L -> "alpha beta alpha gamma", 1L -> "alpha beta beta beta",
      2L -> "delta epsilon delta zeta", 3L -> "alpha delta epsilon zeta")
    val targetIds = Set(0L, 1L)
    val allToks = all.flatMap { case (id, t) => t.split("\\s+").map(id -> _) }
    val cr = allToks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = allToks.filter(p => targetIds(p._1)).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val v = cr.size.toLong
    val s = (cr.values.sum + v).toDouble / (ct.values.sum + v).toDouble
    def microSum(text: String): (Long, Long) = {
      val tfs = text.split("\\s+").groupBy(identity).view.mapValues(_.length).toMap
      val micro = tfs.map { case (tok, tf) =>
        val term = tf * math.log(((ct(tok) + 1.0) / (cr(tok) + 1.0)) * s)
        math.floor(term * 1e6).toLong
      }.sum
      (tfs.values.sum.toLong, micro)
    }
    all.foreach { case (id, text) =>
      assert(got(id) === microSum(text), s"doc $id mismatch")
    }
    // target-flavored docs outrank off-target docs
    assert(got(0L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
    assert(got(0L)._2 > 0 && got(2L)._2 < 0)
  }

  test("grouped split keyed on source is leakage-safe: sources are atomic") {
    import spark.implicits._
    val df = (0L until 600L).map(i => (i, s"src${i % 40}"))
      .toDF("doc_id", "source")
    val labeled = Sampling.splitAssign(df, "source",
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"), salt = "gsplit:")
    // every source lands in exactly ONE split — the leakage-safety
    // contract: near-dups concentrated within a source can never
    // straddle the train/eval boundary
    val perSource = labeled.select("source", "split").distinct()
      .groupBy("source").count().select("count").as[Long].collect()
    assert(perSource.nonEmpty && perSource.forall(_ === 1L))
    // all docs labeled, none dropped or duplicated
    assert(labeled.count() === 600L)
    // docs of the same source agree with the source-level assignment
    val bySource = labeled.select("source", "split").as[(String, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(bySource.values.forall(_.size == 1))
  }

  test("mixTemperature damps head sources and boosts tail sources") {
    import spark.implicits._
    // skewed corpus: 'big' carries 16× the tokens of 'small'
    val docs = ((0 until 320).map(i => (i.toLong, "w " * 10, "big")) ++
      (320 until 340).map(i => (i.toLong, "w " * 10, "small")))
      .toDF("doc_id", "text", "source")
    val rates = Sampling.mixTemperature(docs, budget = 800)
      .select("source", "rate_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // proportional sampling would admit both at 800/3400 ≈ 23.5%; sqrt
    // temperature shifts mass to the tail: sqrt-share weights are 4:1
    // (vs 16:1 token share), so 'small' samples at 4× the rate 'big'
    // does (budget low enough that neither side clamps at 100%)
    assert(rates("small").toDouble / rates("big") > 3.5,
      s"rates: $rates")
    assert(rates("big") < 235294L)   // head damped below proportional
    assert(rates("small") > 235294L) // tail boosted above proportional
    // determinism: the admitted id set is identical across runs
    val a = Sampling.mixTemperature(docs, 800).select("doc_id").collect().toSeq
    val b = Sampling.mixTemperature(docs, 800).select("doc_id").collect().toSeq
    assert(a === b)
  }

  test("mixUpsample repeats tail sources past one epoch and hits token targets") {
    import spark.implicits._
    val docs = ((0 until 320).map(i => (i.toLong, "w " * 10, "big")) ++
      (320 until 340).map(i => (i.toLong, "w " * 10, "small")))
      .toDF("doc_id", "text", "source")
    // budget 2× the corpus: 'small' (sqrt-share weight 1/5 of the mass
    // on 1/17 of the tokens) must exceed one epoch
    val out = Sampling.mixUpsample(docs, budget = 6800).collect()
    val bySrc = out.groupBy(_.getString(1))
    val smallCopies = bySrc("small").map(r => r.getLong(0) -> r.getInt(2))
    assert(smallCopies.exists(_._2 >= 2), "tail source must repeat")
    // every doc's copies are 1..n with no gaps
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getInt(2)).sorted
      assert(cs === (1 to cs.length).toArray)
    }
    // landed token mass per source ≈ its integer-arithmetic target
    // (exact up to the fractional-copy hash gate's sampling error)
    val smallTok = bySrc("small").map(_.getLong(3)).sum
    val bigTok = bySrc("big").map(_.getLong(3)).sum
    assert(smallTok >= 1000 && smallTok <= 2400, s"small landed $smallTok")
    assert(bigTok >= 4400 && bigTok <= 6600, s"big landed $bigTok")
  }
}
