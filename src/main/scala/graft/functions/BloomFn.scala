package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Session-level exposure of Spark's own runtime-filter Bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair the
  * `InjectRuntimeFilter` optimizer rule plants under joins) as callable
  * functions `bloom_agg(h[, expectedItems])` / `bloom_might_contain(bf, h)`.
  *
  * Why expose them: the exact-set broadcast in [[graft.operators.Dedup
  * .decontaminate]] is bounded by the 8 GB broadcast hard limit — a
  * billion-shingle eval suite needs ~8 GB exact but ~1.2 GB as a 3%-fpp
  * Bloom, and the filter is built INSIDE the plan (distributed partial
  * aggregation, merged buffers), never on the driver, so the whole
  * prefilter stays lazy and cluster-sized. False positives are removed by
  * an exact verify pass downstream, so operators composed from these stay
  * exact.
  *
  * The reference has no sketch machinery at all (SURVEY §4.1); this is
  * pure scale infrastructure for the training-data pipeline tier.
  */
object BloomFn {

  val aggRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"bloom_agg takes 1-3 arguments, got ${other.length}")
      })

  val mightContainRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"bloom_might_contain requires exactly 2 arguments, got ${children.length}")
        BloomFilterMightContain(children.head, children(1))
      })

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(aggRegistration)
    ext.injectFunction(mightContainRegistration)
  }

  /** `bloom_agg(h, expectedItems)` — aggregate a LongType column into a
    * serialized Bloom filter (BinaryType, one row).
    */
  def bloomAgg(h: Column, expectedItems: Long): Column =
    call_function("bloom_agg", h, org.apache.spark.sql.functions.lit(expectedItems))

  /** `bloom_might_contain(bf, h)` — membership probe; `bf` must be a
    * constant or scalar-subquery Bloom binary.
    */
  def mightContain(bf: Column, h: Column): Column =
    call_function("bloom_might_contain", bf, h)
}
