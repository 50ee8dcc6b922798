package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkTestSession {

  /** Sequential reference for the Morton interleave. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until Layout.Bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zorderAssign matches the bit-interleave reference") {
    import spark.implicits._
    val df = (for (x <- 0L until 50L; y <- 0L until 40L)
      yield (x, y)).toDF("x", "y")
    val mx = 50L
    val my = 40L
    val got = Layout.zorderAssign(df, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val scale = 1L << Layout.Bits
    val cellW = (1L << (2 * Layout.Bits)) / Layout.Files
    for (x <- 0L until 50L; y <- 0L until 40L) {
      val z = mortonRef(x * scale / mx, y * scale / my)
      assert(got((x, y)) === ((z, z / cellW)),
        s"mismatch at ($x, $y)")
    }
  }

  test("z-order files have tight envelopes on BOTH dims; linear sort does not") {
    val li = graft.Engine.Tables(spark, "/root/testdata/sf0.001").lineitem
    val stats = Layout.zorderStats(li, "l_orderkey", "l_partkey").collect()
    val (maxX, maxY) = (
      stats.map(_.getLong(3)).max.toDouble, stats.map(_.getLong(5)).max.toDouble)
    // mean per-file envelope width as a fraction of the domain, each dim
    def width(minI: Int, maxI: Int, dom: Double): Double =
      stats.map(r => (r.getLong(maxI) - r.getLong(minI)) / dom).sum / stats.length
    val wx = width(2, 3, maxX)
    val wy = width(4, 5, maxY)
    // both dims prunable: every file's envelope is a strict sub-range of
    // the domain in x AND y (a linear sort on x gives wy ≈ 1.0)
    assert(wx < 0.5, s"x envelopes too wide: $wx")
    assert(wy < 0.5, s"y envelopes too wide: $wy")
    // and the files tile all rows exactly once
    assert(stats.map(_.getLong(1)).sum === li.count())
  }
}
