package graft

/** Plan inspector: `runMain graft.Explain [sfDir] [query ...]` prints the
  * formatted physical plan of the named SparkEntry queries (all when none
  * named) — the feedback loop for the 100 TB design review: check
  * PushedFilters/ReadSchema on scans, broadcast vs shuffle join choices,
  * and WholeStageCodegen span width.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"available: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = Engine.session(cpus = 4, appName = "graft-explain")
    names.foreach { name =>
      println(s"\n===================== $name =====================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
