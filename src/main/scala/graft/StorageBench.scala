package graft

import java.io.{BufferedOutputStream, File, FileOutputStream}

/** Storage-verb benchmark against BASELINE.md's only published reference
  * numbers (SDFS PUT/GET latency vs file size, MP2 report graphs 1–2).
  * `runMain graft.StorageBench [sizeMb]` generates a deterministic local
  * file, times Warehouse put (S1) and get (S2), verifies the round trip
  * byte-length, and prints one JSON line.
  *
  * Context for the comparison (recorded in STORAGE.md): the reference's
  * numbers are a 10-VM cluster doing 4-way replication over raw TCP;
  * this run is one node writing local disk through the Hadoop
  * FileSystem API. Same verb surface and the same single-client wall
  * clock the reference's graphs measure — replication durability is
  * delegated to the filesystem (HDFS/S3) on the deployment path.
  */
object StorageBench {
  def main(args: Array[String]): Unit = {
    val sizeMb = args.headOption.map(_.toInt).getOrElse(1024)
    val spark = Engine.session(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-storage-bench")
    val tmp = java.nio.file.Files.createTempDirectory("graft-storage").toString
    val local = s"$tmp/in.bin"
    val buf = new Array[Byte](1 << 20)
    var i = 0
    while (i < buf.length) { buf(i) = (i * 31 + 7).toByte; i += 1 }
    val out = new BufferedOutputStream(new FileOutputStream(local))
    try (0 until sizeMb).foreach(_ => out.write(buf)) finally out.close()

    val wh = new sources.Warehouse(spark, s"$tmp/warehouse")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val putS = time(wh.put(local, "big.bin"))
    val getS = time(wh.get("big.bin", s"$tmp/out.bin"))
    require(new File(s"$tmp/out.bin").length == new File(local).length,
      "round-trip length mismatch")
    println(f"""{"metric":"storage","size_mb":$sizeMb,"put_sec":$putS%.3f,"get_sec":$getS%.3f}""")
    spark.stop()
  }
}
