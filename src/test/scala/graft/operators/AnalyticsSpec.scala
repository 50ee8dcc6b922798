package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q28: in-array fold/filter agree with plain aggregation") {
    import spark.implicits._
    val got = Analytics.q28ArrayFns(spark, dir)
    val plain = graft.Engine.Tables(spark, dir).lineitem
      .select($"l_orderkey", $"l_quantity".cast("long").as("q"))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("e_n"), sum($"q").as("e_total"),
        sum(when($"q" > 25, 1L).otherwise(0L)).as("e_heavy"),
        (min($"q") * 2).as("e_min2"), max($"q").as("e_max"))
    val mismatches = got.join(plain, "l_orderkey")
      .filter($"n_items" =!= $"e_n" || $"total_qty" =!= $"e_total" ||
        $"n_heavy" =!= $"e_heavy" || $"min_qty_x2" =!= $"e_min2" ||
        $"max_qty" =!= $"e_max")
      .count()
    assert(mismatches === 0L)
    assert(got.count() === plain.count())
  }

  test("q29: calendar fields reconstruct the source date") {
    import spark.implicits._
    val orders = graft.Engine.Tables(spark, dir).orders
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val bad = Analytics.q29DatesRegex(spark, dir).join(orders, "o_orderkey")
      .filter(
        make_date($"o_year", $"o_month", $"o_day") =!= $"o_orderdate".cast("date") ||
        $"o_quarter" =!= expr("(o_month + 2) div 3") ||
        // month_start_us is midnight UTC on the 1st of the same month
        from_unixtime($"month_start_us" / 1000000L, "yyyy-MM-01") =!=
          date_format($"o_orderdate", "yyyy-MM-01") ||
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")) =!=
          $"days_since_95" ||
        !$"eom".startsWith(date_format($"o_orderdate", "yyyy-MM")) ||
        concat($"priority_num", lit("-"), upper($"priority_name")) =!=
          $"o_orderpriority")
      .count()
    assert(bad === 0L)
  }

  test("q20: quartiles bracket correctly and are exact on a known set") {
    import spark.implicits._
    // 1..5 → p25=2, p50=3, p75=4 (positions land on elements exactly)
    val df = Seq(1d, 2d, 3d, 4d, 5d).map(("A", _)).toDF("l_returnflag", "l_quantity")
    val r = df.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("q"))
      .head.getSeq[Double](1)
    assert(r === Seq(2d, 3d, 4d))
  }

  test("q21: corr of an exact linear relation is 1") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 3d * i + 7d, "A"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
    val row = df.groupBy($"l_returnflag").agg(
      round(corr($"l_quantity", $"l_extendedprice"), 4).as("c"),
      round(regr_slope($"l_extendedprice", $"l_quantity"), 2).as("s")).head
    assert(row.getDouble(1) === 1.0)
    assert(row.getDouble(2) === 3.0)
  }

  test("sessionization: gap splits, unique-event ordering, exact us math") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in ns
    val ev = Seq(
      (1L, 10L, 0L * m), (1L, 11L, 5L * m), (1L, 12L, 50L * m), // user 1: 2 sessions
      (2L, 20L, 0L * m) // user 2: 1 session
    ).toDF("user_id", "event_id", "ts")
    val sess = Analytics.sessionize(ev)
      .select($"user_id", $"session_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sess === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("cube emits all four grouping shapes") {
    val out = Analytics.q23GroupingSets(spark, dir)
    val shapes = out.select(
      col("r_name").isNull.as("rn"), col("c_mktsegment").isNull.as("mn"))
      .distinct.collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(shapes === Set((false, false), (false, true), (true, false), (true, true)))
  }

  test("salted agg equals the plain groupBy exactly") {
    val salted = Analytics.skewSaltedAgg(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = graft.Engine.Tables(spark, dir).events
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === plain)
  }

  test("tfidf: a corpus-unique term outranks ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta common common"),
      (1L, "common beta gamma"),
      (2L, "common beta delta")).toDF("doc_id", "text")
    // reuse the real pipeline against a temp dir-less frame via the same ops
    val tf = docs.select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val top = tf.join(dfreq, "term")
      .withColumn("score", $"tf" * log((lit(n) + 1.0) / ($"df" + 1.0)))
      .where($"doc_id" === 0L).orderBy($"score".desc, $"term")
      .select($"term").head.getString(0)
    // 'common' appears twice in doc 0 but everywhere in the corpus;
    // 'alpha' is unique to doc 0 and must win
    assert(top === "alpha")
  }

  test("cohortRetention: offset-0 covers each cohort; cells bounded by cohort size") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.cohortRetention(spark, dir).collect()
    assert(out.nonEmpty)
    val offset0 = out.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every cohort's first-seen day is an offset-0 cell containing ALL its
    // users, so the offset-0 column partitions the user base
    assert(out.map(_.getLong(0)).distinct.forall(offset0.contains))
    val totalUsers = graft.Engine.Tables(spark, dir).events
      .select("user_id").distinct().count()
    assert(offset0.values.sum === totalUsers)
    out.foreach { r =>
      assert(r.getLong(1) >= 0, "offset can't precede the cohort day")
      assert(r.getLong(2) <= offset0(r.getLong(0)), "retention exceeds cohort size")
    }
  }

  test("funnelStages: stage timestamps are strictly ordered, -1 marks unreached") {
    val out = Analytics.funnelStages(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (stage, v, c, p) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
      stage match {
        case 3 => assert(v > 0 && c > v && p > c)
        case 2 => assert(v > 0 && c > v && p == -1L)
        case 1 => assert(v > 0 && c == -1L && p == -1L)
        case 0 => assert(v == -1L && c == -1L && p == -1L)
      }
    }
    // the synthetic events are dense enough that some user completes it
    assert(out.exists(_.getInt(1) == 3))
  }

  test("q30 unpivot: three measure rows per flag, values equal the wide agg") {
    val long = Analytics.q30Unpivot(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val flags = long.keys.map(_._1).toSet
    assert(long.size === flags.size * 3)
    val wide = graft.Engine.Tables(spark, "/root/testdata/sf0.001").lineitem
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("s"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(1 + 1))).toMap
    wide.foreach { case (f, (s, n)) =>
      assert(long((f, "sum_qty")) === s)
      assert(long((f, "n_rows")) === n.toDouble)
    }
  }

  test("q31 resample: contiguous hourly grid, LOCF fill matches a replay") {
    val rows = Analytics.q31Resample(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // independent reference: replay per user from the raw events
    val ev = graft.Engine.Tables(spark, "/root/testdata/sf0.001").events
      .filter("user_id % 50 = 0")
      .selectExpr("user_id", "ts div 1000 div 3600000000 AS hr", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hourly = ev.groupBy(e => (e._1, e._2))
      .map { case ((u, h), xs) => (u, h) -> xs.map(_._3).max }
    val byUser = hourly.keys.groupBy(_._1)
    for ((u, keys) <- byUser) {
      val (h0, h1) = (keys.map(_._2).min, keys.map(_._2).max)
      val mine = rows.filter(_._1 == u).sortBy(_._2)
      assert(mine.map(_._2).toSeq === (h0 to h1).toSeq) // contiguous grid
      var lastVal = Double.NaN
      for ((_, hr, obs, filled) <- mine) {
        hourly.get((u, hr)) match {
          case Some(v) => assert(obs && filled == v); lastVal = v
          case None    => assert(!obs && filled == lastVal)
        }
      }
    }
  }
}
