package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary over the driver fixtures (TESTDATA.md).
  *
  * Round 8 shipped with 11 silently-broken queries because the driver
  * regenerated `/root/testdata` mid-round and flipped `events.ts` from
  * parquet TIMESTAMP(NANOS) (read as Long via nanosAsLong) to
  * timestamp[us] (read as TIMESTAMP_NTZ) — and nothing in the build
  * asserted the types the operators assume, so the breakage surfaced
  * only at the round gate. This spec makes the next regeneration fail
  * the build loudly: it pins, per table, the column names in order and
  * the exact Spark-side types the operator surface computes on.
  *
  * `events` is asserted POST-canonicalization (`Engine.Tables.events`),
  * because that Long-ns `ts` is the contract every events operator sees;
  * a raw-schema assert would re-break on exactly the drift the
  * canonicalizer was built to absorb. Both raw generations are accepted
  * by a separate assert on the raw read.
  */
class FixtureSchemaSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def assertSchema(name: String, df: org.apache.spark.sql.DataFrame,
      expected: Seq[(String, DataType)]): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType)
    assert(actual == expected,
      s"\nfixture table `$name` drifted:\n  expected ${expected.mkString(", ")}" +
        s"\n  actual   ${actual.mkString(", ")}")
  }

  test("fixture schemas match the types the operator surface assumes") {
    val t = Engine.Tables(spark, dir)
    assertSchema("region", t.region, Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", t.nation, Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertSchema("customer", t.customer, Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertSchema("supplier", t.supplier, Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertSchema("part", t.part, Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertSchema("orders", t.orders, Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assertSchema("lineitem", t.lineitem, Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    assertSchema("events (canonicalized)", t.events, Seq(
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
    assertSchema("documents", t.documents, Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", t.embeddings, Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("raw events.ts is one of the two known fixture generations") {
    val raw = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(raw == LongType || raw == TimestampType || raw == TimestampNTZType,
      s"events.ts raw type $raw is neither Long ns nor a timestamp — " +
        "extend Engine.canonicalizeEventTs deliberately")
  }

  test("canonicalizer rejects an unknown ts type loudly") {
    import spark.implicits._
    val bogus = Seq(("x", 1.5)).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Engine.canonicalizeEventTs(bogus))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("canonicalizer is exact-integer on the timestamp generation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // round-trip: a known µs instant must surface as exactly µs*1000 ns
    val df = Seq(1L).toDF("k")
      .withColumn("ts", timestamp_micros(lit(1706745600123456L)))
      .select(col("k"), col("ts"))
    val canon = Engine.canonicalizeEventTs(df)
    assert(canon.schema("ts").dataType == LongType)
    assert(canon.select("ts").as[Long].head() == 1706745600123456L * 1000L)
  }
}
