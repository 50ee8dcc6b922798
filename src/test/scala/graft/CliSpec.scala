package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI parity: the reference's manual smoke script
  * (`command_backup:1-20`) — put/get round-trip, then the wordcount
  * maple+juice pipeline over external executables — replayed through the
  * Handler against a temp warehouse.
  */
class CliSpec extends AnyFunSuite with SparkTestSession {

  private lazy val whDir =
    java.nio.file.Files.createTempDirectory("graft-wh").toString
  private lazy val cli = new Cli.Handler(spark, whDir)

  test("put / store / ls / get round-trip preserves bytes") {
    val src = "/root/reference/mj_exe/wc_simple_input"
    assert(cli.execute(s"put $src wc_in").startsWith("put"))
    assert(cli.execute("store").linesIterator.contains("wc_in"))
    assert(cli.execute("ls wc_in").contains("wc_in"))
    val back = java.nio.file.Files.createTempFile("graft-get", ".txt").toString
    new java.io.File(back).delete()
    cli.execute(s"get wc_in $back")
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(src))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(back))
    assert(a.toSeq === b.toSeq)
  }

  /** Write an executable script, as the reference ships its mj_exe/ Go
    * binaries — the CLI receives a path, one token.
    */
  private def exe(body: String): String = {
    val f = java.nio.file.Files.createTempFile("graft-exe", ".sh")
    java.nio.file.Files.writeString(f, s"#!/bin/sh\n$body\n")
    f.toFile.setExecutable(true)
    f.toString
  }

  test("maple + juice wordcount pipeline over external executables") {
    cli.execute(s"put /root/reference/mj_exe/wc_simple_input wc_in")
    val mapleExe = exe("""awk '{for (i = 1; i <= NF; i++) print $i, 1}'""")
    val juiceExe = exe("""awk '{k = $1; s += $2} END {if (k != "") print k, s}'""")
    val m = cli.execute(s"maple $mapleExe 3 wc wc_in")
    assert(m.contains("maple done"), m)
    val j = cli.execute(s"juice $juiceExe 2 wc wc_out 1 hash")
    assert(j.contains("juice done"), j)
    // intermediate GC'd (delete flag = 1)
    assert(!cli.execute("store").linesIterator.contains("wc__intermediate"))
    // result matches an independent count
    val out = java.nio.file.Files.createTempFile("graft-wc", ".txt").toString
    new java.io.File(out).delete()
    cli.execute(s"get wc_out $out")
    val got = scala.io.Source.fromFile(out).getLines().filter(_.nonEmpty).map { l =>
      val Array(w, c) = l.split(" "); w -> c.toInt
    }.toMap
    val srcLines = scala.io.Source.fromFile("/root/reference/mj_exe/wc_simple_input")
    val expect = srcLines.getLines().flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .toSeq.groupBy(identity).map { case (w, ws) => w -> ws.size }
    srcLines.close()
    assert(got === expect)
  }

  test("delete removes from the namespace; members/id report topology") {
    cli.execute(s"put /root/reference/mj_exe/wc_simple_input doomed")
    assert(cli.execute("delete doomed") === "deleted doomed")
    assert(!cli.execute("store").linesIterator.contains("doomed"))
    assert(cli.execute("members").nonEmpty)
    assert(cli.execute("id").startsWith("local-"))
  }
}
