package graft.functions

import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Bounded top-k aggregate: keeps the k LARGEST values of an orderable
  * expression (under Spark's natural ordering for the type — for structs,
  * lexicographic by field) and emits them as an array sorted descending.
  *
  * This is the shuffle-bounded replacement for the
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` spelling that
  * the per-key ranking operators use: the window plan exchanges and sorts
  * EVERY candidate row on the key, so shuffle volume is the full scored
  * relation (at 100 TB, the (query × corpus) score matrix). As a
  * TypedImperativeAggregate this runs under ObjectHashAggregate with a
  * partial/final split — each map task keeps at most k rows per key in a
  * bounded binary heap and the exchange carries one serialized k-element
  * buffer per (task, key) instead of every candidate. No sort anywhere:
  * the heap's final drain orders the k survivors.
  *
  * Direction encoding: the aggregate keeps LARGEST under the struct's
  * natural ordering; callers encode per-field direction by negating
  * numeric fields that rank ascending (the per-key ranking operators order
  * by (score desc, id asc) → `struct(score, -id, ...payload)`). Rank is
  * recovered by `posexplode` over the emitted array (pos 0 = rank 1).
  *
  * k is a foldable positive int — driver-bounded output per key is the
  * contract that makes the buffer (and the exchange) bounded. The
  * contract is enforced in [[checkInputDataTypes]], so a non-foldable
  * or non-positive k fails ANALYSIS (an AnalysisException at plan
  * time), never a task-time surprise.
  *
  * Null inputs are skipped (Max/Min semantics); an all-null group emits an
  * empty array, never null, so downstream posexplode drops the key rather
  * than producing a null-rank row.
  *
  * Aggregation-regime guidance (A/B-measured on the 20× corpus, round
  * 17): ObjectHashAggregate's sort-based fallback
  * (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`,
  * default 128 keys) needs NO retune for this aggregate. Three arms —
  * default, forced-immediate fallback (threshold 1) and never-fallback
  * (threshold Int.MaxValue) — land within ±15% (the box-noise band)
  * with identical results on every per-key ranking gate, including the
  * high-cardinality q7/topk_agg keys the fallback serde was suspected
  * to hurt. The reason is structural: the serialized buffer is ≤ k
  * structs in EVERY regime, so serde volume is k × keys regardless of
  * when the hash map falls back — the regime only moves WHERE the
  * k-bounding happens (heap insert vs sorted-run merge), and both are
  * O(n log k). These gates are scoring-bound, not aggregation-bound.
  */
case class TopKStructs(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[Any]] {

  // checkInputDataTypes (below) rejects anything else at analysis time;
  // the eval here only runs on plans that passed it (foldable → eval(null)
  // is legal; constant folding usually collapses kExpr to a Literal anyway).
  private lazy val k: Int = kExpr.eval() match {
    case v: Int if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"topk_structs requires a foldable positive int k, got $other — " +
        "an unbounded or data-dependent k would unbound the aggregation buffer")
  }

  // Min-heap over the element ordering: the root is the SMALLEST retained
  // value, so a candidate beats the heap iff it exceeds the root.
  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  private lazy val comparator = new java.util.Comparator[Any] {
    override def compare(a: Any, b: Any): Int = ordering.compare(a, b)
  }

  // The bounded-buffer contract is part of the TYPE check: a
  // non-foldable k (a column, a subquery) would make buffer size
  // data-dependent — unbounded — so it is rejected at analysis time with
  // the same loudness as an unorderable child, not discovered when the
  // first task builds its buffer.
  override def checkInputDataTypes(): TypeCheckResult = {
    val orderable = TypeUtils.checkForOrderingExpr(child.dataType, "topk_structs")
    if (orderable != TypeCheckResult.TypeCheckSuccess) orderable
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "topk_structs: k must be a foldable INT (a literal), got " +
          s"${kExpr.dataType.simpleString} foldable=${kExpr.foldable} — " +
          "a data-dependent k would unbound the aggregation buffer")
    else kExpr.eval() match {
      case v: Int if v > 0 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_structs: k must be a positive int, got $other")
    }
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): JPriorityQueue[Any] =
    new JPriorityQueue[Any](k + 1, comparator)

  private def offer(buffer: JPriorityQueue[Any], value: Any): Unit = {
    if (buffer.size < k) {
      buffer.offer(value)
    } else if (ordering.compare(value, buffer.peek()) > 0) {
      buffer.poll()
      buffer.offer(value)
    }
  }

  override def update(buffer: JPriorityQueue[Any], input: InternalRow): JPriorityQueue[Any] = {
    val v = child.eval(input)
    // copy only when the value is actually retained — the vast majority of
    // candidates lose to the heap root and never need a defensive copy of
    // the (reused) unsafe backing buffer.
    if (v != null && (buffer.size < k || ordering.compare(v, buffer.peek()) > 0)) {
      offer(buffer, InternalRow.copyValue(v))
    }
    buffer
  }

  override def merge(buffer: JPriorityQueue[Any], other: JPriorityQueue[Any]): JPriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) offer(buffer, it.next())
    buffer
  }

  override def eval(buffer: JPriorityQueue[Any]): Any = {
    // drain ascending, reverse in place → descending (rank order).
    val n = buffer.size
    val out = new Array[Any](n)
    var i = n - 1
    while (i >= 0) { out(i) = buffer.poll(); i -= 1 }
    // eval consumes the buffer; refill so repeated eval (unsupported by the
    // agg framework but cheap to be safe against) stays consistent.
    out.foreach(buffer.offer)
    new GenericArrayData(out)
  }

  // Serialization mirrors Spark's own Collect aggregates: project the
  // retained values as one unsafe array row and ship its bytes. The heap is
  // order-insensitive on the wire — deserialize re-offers element by element.
  private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: JPriorityQueue[Any]): Array[Byte] = {
    val arr = new GenericArrayData(buffer.toArray)
    serProj.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buffer = createAggregationBuffer()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // the unsafe array points into `bytes`, which this buffer owns and
      // never mutates — but merge() moves values into longer-lived heaps,
      // so copy out of the transient wire buffer.
      buffer.offer(InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKStructs {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("topk_structs"),
      new ExpressionInfo(classOf[TopKStructs].getName, "topk_structs"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"topk_structs requires exactly 2 arguments (value, k), got ${children.length}")
        TopKStructs(children(0), children(1))
      })

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(registration)

  /** Column-level entry point (requires a [[register]]ed session). */
  def topkStructs(value: Column, k: Int): Column =
    call_function("topk_structs", value, org.apache.spark.sql.functions.lit(k))
}
