package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke: replicate the testdata `factor`× with key-shifted
  * replicas (foreign keys stay consistent, so every join/aggregate is
  * semantically meaningful at the larger size), then run the full
  * SparkEntry suite against it and print per-query seconds as one JSON
  * line. `runMain graft.Stress [sfDir] [factor]` — factor 10 over sf0.1
  * is a ~sf1-equivalent (≈6M-row lineitem) single-box check that no
  * operator degrades super-linearly.
  *
  * Dimension tables (region/nation/part/supplier) are kept as-is;
  * fact/event/doc tables shift their keys by `i × (max+1)` per replica.
  * Document text gets a per-replica suffix token so the dedup operators
  * see a 10× corpus of high-similarity (not byte-identical) neighbors —
  * the adversarial shape for LSH banding and candidate verification.
  */
object Stress {

  private def shifted(df: DataFrame, factor: Int)(rep: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => rep(df, i)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    require(factor >= 1, s"replication factor must be >= 1, got $factor")
    val out = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val spark = Engine.session(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stress")
    val t = Engine.Tables(spark, sfDir)

    def maxOf(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0) + 1

    val (maxCust, maxOrd, maxUser, maxEvent, maxDoc, maxVec) =
      (maxOf(t.customer, "c_custkey"), maxOf(t.orders, "o_orderkey"),
        maxOf(t.events, "user_id"), maxOf(t.events, "event_id"),
        maxOf(t.documents, "doc_id"), maxOf(t.embeddings, "vec_id"))

    def save(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    Seq("region", "nation", "part", "supplier").foreach(n => save(n, t.table(n)))
    save("customer", shifted(t.customer, factor)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * maxCust))))
    save("orders", shifted(t.orders, factor)((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(i * maxCust))))
    save("lineitem", shifted(t.lineitem, factor)((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrd))))
    save("events", shifted(t.events, factor)((d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * maxEvent))
        .withColumn("user_id", col("user_id") + lit(i * maxUser))))
    save("documents", shifted(t.documents, factor)((d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * maxDoc))
        .withColumn("text", concat(col("text"), lit(s" r$i")))))
    save("embeddings", shifted(t.embeddings, factor)((d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * maxVec))))

    // Warm-run discipline, same as Bench (methodology note there): one
    // untimed pass first, then the timed pass. Cold first-execution cost
    // (Janino codegen + JIT tiering of the fresh generated classes) is
    // nondeterministic at this plan size — measured 18-26 s warm vs
    // 70-98 s cold for dedup_jaccard on the 10× corpus, same plan, same
    // rows — and the scaling ratios STRESS.md reports compare against
    // the warm-run bench, so the stress pass must be warm too.
    System.err.println("[stress] methodology: warm-run (untimed full pass, then timed)")
    // Dev-only selective run, same contract as Verify/Bench: unset = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val queries = SparkEntry.queries.filter(q => selected(q._1))
    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, out).count() catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[stress] WARM-UP FAILURE $name: ${e.getMessage}")
      }
    }
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, out).count() catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[stress] $name failed: ${e.getMessage}")
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (sec, n)
    }
    val qs = results.map { case (k, (s, n)) => s""""$k":{"sec":$s,"rows":$n}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stress_total","value":${results.map(_._2._1).sum},""" +
      s""""unit":"sec","factor":$factor,"queries":$qs,"base":"$sfDir"}""")
    spark.stop()
    // a smoke that cannot fail is not a smoke
    if (results.exists(_._2._2 < 0)) sys.exit(1)
  }
}
