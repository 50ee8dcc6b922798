package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-STAGE spill/shuffle attribution for optimization work — Stress
  * reports one spill number per query, which says a gate spills but not
  * WHERE. `runMain graft.StageSpill <dataDir> <query> [reps]` runs the
  * named gate against an (already materialized, e.g. Stress-replicated)
  * table directory and prints, per completed stage: wall time, task
  * count, spill (mem/disk), shuffle read/write, and the first line of
  * the stage's callsite so the number maps back to a plan operator.
  *
  * Diagnostic only — never part of the gate surface; the artifact of
  * record for scale claims stays the Stress JSON.
  */
object StageSpill {

  private final case class StageRow(id: Int, name: String, tasks: Int,
      ms: Long, spillMemMb: Long, spillDiskMb: Long,
      shufReadMb: Long, shufWriteMb: Long, outRows: Long)

  private final class StageListener extends SparkListener {
    val rows = new ArrayBuffer[StageRow]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      def acc(name: String): Long =
        si.accumulables.values.find(_.name.contains(name))
          .flatMap(_.value).map(_.toString.toLong).getOrElse(0L)
      val ms = (for {a <- si.completionTime; b <- si.submissionTime}
        yield a - b).getOrElse(0L)
      rows.synchronized {
        rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, ms,
          acc("internal.metrics.memoryBytesSpilled") >> 20,
          acc("internal.metrics.diskBytesSpilled") >> 20,
          (acc("internal.metrics.shuffle.read.localBytesRead") +
            acc("internal.metrics.shuffle.read.remoteBytesRead")) >> 20,
          acc("internal.metrics.shuffle.write.bytesWritten") >> 20,
          acc("internal.metrics.shuffle.write.recordsWritten"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageSpill <dataDir> <query> [reps]")
    val (dir, query) = (args(0), args(1))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stagespill")
    val fn = SparkEntry.queries(query)
    fn(spark, dir).count() // warm: codegen/JIT, same discipline as Stress
    val l = new StageListener
    spark.sparkContext.addSparkListener(l)
    // Per-rep GC attribution: total collector wall across all GC beans,
    // delta per rep. The 20× band's signature (round-17 finding) is a
    // rep where EVERY stage inflates by the same 10-30× with identical
    // shuffle volumes and zero spill — stage-uniform inflation is a
    // JVM/box epoch, and this number says whether the epoch is GC.
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    (1 to reps).foreach { r =>
      l.rows.synchronized(l.rows.clear())
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - gc0) / 1e3
      Thread.sleep(500) // let straggler stage-completed events drain
      println(f"== $query rep $r: $sec%.1f s, $n rows, gc $gcSec%.1f s")
      println(f"${"stage"}%5s ${"tasks"}%5s ${"sec"}%8s ${"spillM"}%8s " +
        f"${"spillD"}%8s ${"shRead"}%8s ${"shWrite"}%8s ${"shRows"}%12s  name")
      l.rows.synchronized(l.rows.sortBy(_.id)).foreach { s =>
        println(f"${s.id}%5d ${s.tasks}%5d ${s.ms / 1000.0}%8.1f " +
          f"${s.spillMemMb}%8d ${s.spillDiskMb}%8d ${s.shufReadMb}%8d " +
          f"${s.shufWriteMb}%8d ${s.outRows}%12d  ${s.name.take(60)}")
      }
    }
    spark.stop()
  }
}
