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

  test("fixture value invariants the operator surface and oracles assume") {
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t = Engine.Tables(spark, d)
      // embeddings: fixed width 64 (kmeans/PQ/IVF oracles unroll dims),
      // no null elements, unique ids, at least k=16 vectors for init
      val emb = t.embeddings.agg(
        count(lit(1)).as("n"),
        countDistinct(col("vec_id")).as("n_ids"),
        min(size(col("embedding"))).as("w_min"),
        max(size(col("embedding"))).as("w_max"),
        sum(when(exists(col("embedding"), _.isNull), 1L).otherwise(0L))
          .as("null_elems")).head()
      assert(emb.getLong(0) >= 16 && emb.getLong(0) === emb.getLong(1),
        s"$d embeddings: dup/too-few vec_ids")
      assert(emb.getInt(2) === 64 && emb.getInt(3) === 64,
        s"$d embeddings: width drifted from 64 — dim-unrolled oracles break")
      assert(emb.getLong(4) === 0L, s"$d embeddings: null elements")
      // documents: non-null ASCII text (the mm_features oracle equates
      // characters with UTF-8 bytes), unique non-negative doc_ids
      val doc = t.documents.agg(
        count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
        sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("empty"),
        sum(when(col("text").rlike("[^\\x00-\\x7F]"), 1L).otherwise(0L))
          .as("non_ascii"),
        min(col("doc_id")).as("min_id")).head()
      assert(doc.getLong(0) === doc.getLong(1), s"$d documents: dup doc_ids")
      assert(doc.getLong(2) === 0L && doc.getLong(3) === 0L,
        s"$d documents: null/empty text")
      assert(doc.getLong(4) === 0L,
        s"$d documents: non-ASCII text — mm_features oracle's char≡byte " +
          "equivalence broke; rewrite that oracle before trusting the gate")
      assert(doc.getLong(5) >= 0L, s"$d documents: negative doc_id")
      // documents.source carries a numeric id < 20 (sourceOverlap's
      // single-Long bitmask domain)
      val badSrc = t.documents.filter(
        regexp_extract(col("source"), "([0-9]+)", 1).cast("int").isNull ||
          regexp_extract(col("source"), "([0-9]+)", 1).cast("int") >= 20)
        .count()
      assert(badSrc === 0L, s"$d documents: source ids outside [0, 20)")
      // events: canonical ts is plausible epoch ns (not µs/ms — a unit
      // slip shifts every window), and the q18 rank oracle needs
      // non-null value/user_id/event_type
      val ev = t.events.agg(
        min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
        sum(when(col("value").isNull || col("user_id").isNull ||
          col("event_type").isNull, 1L).otherwise(0L)).as("nulls")).head()
      assert(ev.getLong(0) > 1_000_000_000_000_000_000L &&
        ev.getLong(1) < 4_000_000_000_000_000_000L,
        s"$d events: ts outside plausible epoch-ns range — unit drift")
      assert(ev.getLong(2) === 0L, s"$d events: null value/user_id/event_type")
    }
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
