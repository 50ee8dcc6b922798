package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global prefix-sums / ranks over PROVABLY BOUNDED tables — the final
  * tiny pass every two-level decomposition in this library ends with
  * (top-k rank stitching, shard offsets, df-histogram quantiles,
  * distinct-value rank tables, vocabulary coverage).
  *
  * Any global running aggregate needs all rows in one place; the
  * question is only how that is expressed. An unpartitioned
  * `Window.orderBy(...)` is semantically right but (a) sprays
  * `WindowExec: No Partition Defined` warnings through every log —
  * known-benign here, which TRAINS READERS TO IGNORE the one warning
  * that will someday be a real corpus-sized window — and (b) enforces
  * nothing: a regression that feeds it an unbounded input degrades
  * silently. This helper replaces that idiom with an explicit
  * single-partition pass that FAILS LOUDLY past `maxRows`: the bound
  * stops being a code comment and becomes a runtime contract, and a
  * clean bench log means every remaining WindowExec warning deserves
  * attention.
  *
  * Scale shape: one exchange of the bounded table into a single task
  * (identical data movement to the unpartitioned WindowExec it
  * replaces), upstream parallelism untouched. `orderCols` must be a
  * total order — ties would make prefix values nondeterministic, same
  * contract as the windows this replaces.
  */
object BoundedGlobal {

  /** Append `outCol` = running sum of Long column `valueCol` in
    * `orderCols` order; `includeCurrent = false` gives the exclusive
    * prefix (SQL `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`,
    * 0 for the first row).
    */
  def withPrefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
      outCol: String, includeCurrent: Boolean, maxRows: Long,
      what: String): DataFrame =
    append(df, orderCols, outCol, maxRows, what) { (r, idx, acc) =>
      val v = r.getLong(idx)
      if (includeCurrent) (acc + v, acc + v) else (acc, acc + v)
    }(Some(valueCol))

  /** Append `outCol` = running sum of Long column `valueCol` that RESETS
    * at each change of `keyCols` — the per-group running-total the
    * partitioned window `sum(...) OVER (PARTITION BY key ORDER BY ...)`
    * computes, for the case where the GROUPS can be corpus-sized but the
    * table itself is provably bounded (e.g. a distinct-(group, value)
    * counts table): a partitioned window over few huge groups puts a
    * corpus in one task while nominally passing "is partitioned" plan
    * checks; this runs the same bounded-table single-partition scan as
    * every other BoundedGlobal pass, with the reset done in the scan.
    *
    * `orderCols` MUST lead with `keyCols` (so each key's rows are
    * contiguous in the scan) and be a total order — both are the same
    * contract the window it replaces would need.
    */
  def withKeyedPrefixSum(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, outCol: String,
      includeCurrent: Boolean, maxRows: Long, what: String): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    require(keyCols.nonEmpty, "withKeyedPrefixSum needs at least one key column")
    val sorted = df.repartition(1).sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema :+ StructField(outCol, LongType, nullable = false))
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val kIdx = keyCols.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { it =>
      var acc = 0L
      var n = 0L
      var prev: Seq[Any] = null
      it.map { r =>
        n += 1
        if (n > maxRows) throw new IllegalStateException(
          s"BoundedGlobal[$what]: more than $maxRows rows reached the " +
            "global single-partition pass — the bounded-domain " +
            "precondition broke (quantize/pre-aggregate the input or " +
            "raise the bound deliberately)")
        val k = kIdx.map(r.get)
        if (prev == null || k != prev) { acc = 0L; prev = k }
        val v = r.getLong(vIdx)
        val out = if (includeCurrent) acc + v else acc
        acc += v
        Row.fromSeq(r.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Append `outCol` = 1-based dense position in `orderCols` order
    * (`row_number()` over the unpartitioned window it replaces).
    */
  def withRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String,
      maxRows: Long, what: String): DataFrame =
    append(df, orderCols, outCol, maxRows, what)((_, _, acc) =>
      (acc + 1, acc + 1))(None)

  /** Shared machinery: single-partition ordered scan appending one Long
    * column; `step(row, valueIdx, acc)` returns (emitted, nextAcc).
    */
  private def append(df: DataFrame, orderCols: Seq[Column], outCol: String,
      maxRows: Long, what: String)
      (step: (Row, Int, Long) => (Long, Long))
      (valueCol: Option[String]): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val sorted = df.repartition(1).sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema :+ StructField(outCol, LongType, nullable = false))
    val idx = valueCol.map(sorted.schema.fieldIndex).getOrElse(-1)
    sorted.mapPartitions { it =>
      var acc = 0L
      var n = 0L
      it.map { r =>
        n += 1
        if (n > maxRows) throw new IllegalStateException(
          s"BoundedGlobal[$what]: more than $maxRows rows reached the " +
            "global single-partition pass — the bounded-domain " +
            "precondition broke (quantize/pre-aggregate the input or " +
            "raise the bound deliberately)")
        val (out, next) = step(r, idx, acc)
        acc = next
        Row.fromSeq(r.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(schema))
  }
}
