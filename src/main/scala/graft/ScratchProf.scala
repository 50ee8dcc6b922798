package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TEMPORARY decomposition profile for pq_adc_topk — not for commit. */
object ScratchProf {
  def time(label: String)(f: => Long): Unit = {
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $label%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%7.3f  rows=$n")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Engine.session(32, "graft-scratch")
    val base = Engine.Tables(spark, sfDir).embeddings
    val maxVec = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    val vecs = (0 until factor).map(i =>
      base.withColumn("vec_id", col("vec_id") + lit(i * maxVec)))
      .reduce(_ unionByName _).localCheckpoint(true)

    // Reproduce pqAdcTopK internals stepwise via package-private access
    val m = 4; val k = 16; val dim = 64; val numQueries = 10; val topK = 10
    val subDim = dim / m
    val books = graft.operators.Similarity.pqCodebooks(m, k, subDim)

    // stage A: encode only
    val codeCols = (0 until m).map { j =>
      val sub = slice(col("embedding"), j * subDim + 1, subDim)
      val scores = books(j).zipWithIndex.map { case (c, p) =>
        struct(
          (lit(c.map(x => x * x).sum) - lit(2.0) * graft.functions.VecDot.vecDot(sub, lit(c))).as("d"),
          lit(p).as("c_id"))
      }
      least(scores: _*).getField("c_id").as(s"code$j")
    }
    val coded = vecs.select(col("vec_id") +: codeCols: _*)
    time("A_encode")(coded.count())

    val queries = vecs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q"))
    val tblCols = (0 until m).map { j =>
      val qSub = slice(col("q"), j * subDim + 1, subDim)
      array(books(j).map { c =>
        floor((lit(c.map(x => x * x).sum) - lit(2.0) * graft.functions.VecDot.vecDot(qSub, lit(c)))
          * lit(1e6)).cast("long")
      }: _*).as(s"tbl$j")
    }
    val tables = queries.select(col("q_id") +: tblCols: _*)
    val approx = (0 until m)
      .map(j => element_at(col(s"tbl$j"), col(s"code$j") + 1))
      .reduceLeft(_ + _)

    // stage B: join + adist, FORCED evaluation (sum prevents pruning)
    val scored0 = coded.crossJoin(broadcast(tables))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adist_micro", approx)
      .select(col("q_id"), col("vec_id"), col("adist_micro"))
    time("B_adist_forced")(scored0.agg(sum("adist_micro")).count())

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist_micro").asc, col("vec_id").asc)

    // E5: persist barrier on coded (the production index-materialization shape)
    val codedP = coded.persist()
    codedP.count()
    val scoredP = codedP.crossJoin(broadcast(tables))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adist_micro", approx)
      .select(col("q_id"), col("vec_id"), col("adist_micro"))
    time("E5_window_persisted_codes")(scoredP
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK).count())
    codedP.unpersist()

    // E6: forced encode only, no join (sum of codes, no pruning)
    time("E6_encode_forced")(coded.agg(sum(col("code0") + col("code1") + col("code2") + col("code3"))).count())

    // stage D: the real queries after the index-materialization fix
    time("D_pq_adc")(graft.operators.Similarity.pqAdcTopK(vecs).count())
    time("D_ivf_pq")(graft.operators.Similarity.ivfPqTopK(vecs).count())

    spark.stop()
  }
}
