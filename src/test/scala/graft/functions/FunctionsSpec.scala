package graft.functions

import graft.SparkTestSession
import graft.functions.Fnv1a64.fnv1a64
import graft.functions.VecDot.vecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: codegen path (through a DataFrame select)
  * must agree with the interpreted twin and with known external vectors.
  */
class Fnv1a64Spec extends AnyFunSuite with SparkTestSession {

  test("matches published FNV-1a 64 test vectors") {
    // independent interpreted implementation
    assert(Fnv1a64.hash("".getBytes("UTF-8")) === Fnv1a64.Offset)
    assert(Fnv1a64.hash("a".getBytes("UTF-8")) ===
      java.lang.Long.parseUnsignedLong("af63dc4c8601ec8c", 16))
    assert(Fnv1a64.hash("foobar".getBytes("UTF-8")) ===
      java.lang.Long.parseUnsignedLong("85944171f73967e8", 16))
  }

  test("codegen path equals interpreted implementation, incl. unicode") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "naïve café", "数据引擎", "x" * 10000)
    val got = inputs.toDF("s").select(fnv1a64(col("s"))).as[Long].collect()
    assert(got.toSeq === inputs.map(s => Fnv1a64.hash(s.getBytes("UTF-8"))))
  }

  test("null propagates") {
    val r = spark.sql("SELECT fnv1a64(CAST(NULL AS STRING))").collect()
    assert(r.head.isNullAt(0))
  }
}

class VecDotSpec extends AnyFunSuite with SparkTestSession {

  test("float arrays: known dot product") {
    import spark.implicits._
    val got = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
      .toDF("a", "b").select(vecDot(col("a"), col("b"))).as[Double].head()
    assert(got === 32.0)
  }

  test("double literal x float column (LSH hyperplane shape)") {
    import spark.implicits._
    val got = Seq(Tuple1(Array(2f, -1f)))
      .toDF("a").select(vecDot(col("a"), lit(Array(0.5, 2.0)))).as[Double].head()
    assert(got === (2 * 0.5 + -1 * 2.0))
  }

  test("empty, length-mismatched, and null-element inputs") {
    val r1 = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT)), CAST(array() AS ARRAY<FLOAT>))").collect()
    assert(r1.head.getDouble(0) === 0.0)
    val r2 = spark.sql(
      """SELECT vec_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
                        array(CAST(10.0 AS FLOAT)))""").collect()
    assert(r2.head.getDouble(0) === 20.0) // shorter side bounds the loop
    val r3 = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
                        array(CAST(5.0 AS FLOAT), CAST(7.0 AS FLOAT)))""").collect()
    assert(r3.head.getDouble(0) === 5.0) // null element contributes 0
  }

  test("accumulation order is left-to-right (oracle-compatible)") {
    import spark.implicits._
    // catastrophic-cancellation probe: result depends on summation order
    val a = Array(1e8f, 1f, -1e8f)
    val b = Array(1f, 1f, 1f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(vecDot(col("a"), col("b"))).as[Double].head()
    val expect = a.foldLeft((0.0, b.iterator)) { case ((s, it), x) =>
      (s + x.toDouble * it.next().toDouble, it)
    }._1
    assert(got === expect)
  }
}
