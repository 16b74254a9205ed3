package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim

/** Skew-robust distributed running fill: the range-partitioned two-pass
  * replacement for the textbook
  * `last(c, ignoreNulls = true) OVER (PARTITION BY key ORDER BY ...
  * ROWS UNBOUNDED PRECEDING)` window, whose one-task-per-key shape
  * serializes an entire stage on a skewed key (one chromosome holding
  * most of a genome's intervals, one symbol holding most of a tape's
  * ticks). Results are IDENTICAL to the window formulation; only the
  * physical plan changes.
  *
  * Scale shape (the same two-pass pattern as [[IntervalOps.coverage]]'s
  * breakpoint prefix sum): ONE range shuffle on (key, ordering) spreads
  * every key across as many partitions as its row share demands — a
  * single-key load uses ALL partitions, not one task. Pass A summarizes
  * each sorted partition into four scalars (first key, last key, last
  * non-null fill value of the trailing key run) — O(partitions) driver
  * state, INDEPENDENT of key cardinality: range partitions are
  * contiguous in the total order, so only a partition's FIRST key can
  * continue from earlier partitions, and its carry-in is found by
  * walking summaries backward while the previous partition's last key
  * still matches (chaining across all-null runs). Pass B streams each
  * sorted partition once, seeded from the broadcast carries. Both
  * passes share one RDD, so the range shuffle's map stage runs once.
  *
  * Both passes run on the plan's `InternalRow`s directly (the sorted
  * rows pass through untouched unless they need a fill, and the
  * re-wrap is [[PlanShim.internalCreateDataFrame]]) — no external-Row
  * decode/re-encode leg. Cost vs the window: one range-boundary
  * sampling job plus the (tiny) pass-A summary job — the price of skew
  * robustness. Callers with guaranteed-balanced high-cardinality keys
  * can keep the plain window; callers that cannot bound the largest
  * key's share should use this.
  */
object RangeFill {

  /** @param df      input frame
    * @param key      partition-key column name (the window's
    *                 PARTITION BY); null keys group together, exactly
    *                 as `Window.partitionBy` groups them
    * @param fillCol  column to fill: each row gets the latest non-null
    *                 value of this column at-or-before it in
    *                 (key, order) sort order (its own value when
    *                 non-null — the inclusive running frame)
    * @param order    the window's ORDER BY within each key (sort
    *                 direction and null placement respected)
    * @param partitions range-partition count; 0 = the session's
    *                 shuffle-partition default
    * @return the input rows (in range-partition order) with `fillCol`
    *         filled; schema unchanged */
  def fill(df: DataFrame, key: String, fillCol: String,
      order: Seq[Column], partitions: Int = 0): DataFrame = {
    val session = df.sparkSession
    val n = if (partitions > 0) partitions
      else session.sessionState.conf.numShufflePartitions
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val fillIdx = schema.fieldIndex(fillCol)
    val fieldTypes = schema.fields.map(_.dataType)
    val keyType = fieldTypes(keyIdx)
    val fillType = fieldTypes(fillIdx)
    val numFields = fieldTypes.length
    // the range exprs ARE the full window ordering (key first): range
    // partitions then concatenate to the exact global sort the window
    // would produce, and equal key tuples never straddle a boundary
    val sortExprs = col(key).asc +: order
    // ONE shared RDD for both passes (pass B reuses pass A's completed
    // range-shuffle map stage instead of re-shuffling). toRdd hands
    // back the plan's own (possibly reused) UnsafeRows, so every value
    // retained ACROSS rows below is detached via InternalRow.copyValue;
    // values forwarded within one iterator step ride the live buffer
    // (the consumer projects each row before pulling the next).
    val rdd = df.repartitionByRange(n, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .queryExecution.toRdd
    def keyOf(r: InternalRow): Any =
      if (r.isNullAt(keyIdx)) null else r.get(keyIdx, keyType)
    // pass A: (pid, nonEmpty, firstKey, lastKey, lastVal) where lastVal
    // is the last non-null fill among the TRAILING run of lastKey rows
    // (the only rows a later partition can continue from)
    val summaries = rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var firstKey: Any = null
      var curKey: Any = null
      var curVal: Any = null
      it.foreach { r =>
        val k = keyOf(r)
        if (!any) {
          any = true
          firstKey = InternalRow.copyValue(k)
          curKey = firstKey
        } else if (k != curKey) {
          curKey = InternalRow.copyValue(k); curVal = null
        }
        if (!r.isNullAt(fillIdx))
          curVal = InternalRow.copyValue(r.get(fillIdx, fillType))
      }
      Iterator.single((pid, any, firstKey, curKey, curVal))
    }.collect().sortBy(_._1)
    // driver: one forward pass, O(partitions). carries(p) = the
    // running value entering partition p (applies only to p's FIRST
    // key); resolved(q) = the running value at q's END for q's LAST
    // key. A partition continues the chain when the previous non-empty
    // partition's last key equals its first key; an all-null
    // whole-partition key run propagates its own carry-in, and a key
    // that began mid-partition with no non-null value resolves to null
    // (no earlier partition can hold it).
    val carries = Array.fill[Any](summaries.length)(null)
    val resolved = Array.fill[Any](summaries.length)(null)
    var prevIdx = -1
    summaries.foreach { case (pid, any, firstKey, lastKey, lastVal) =>
      if (any) {
        if (prevIdx >= 0 && summaries(prevIdx)._4 == firstKey)
          carries(pid) = resolved(prevIdx)
        resolved(pid) =
          if (lastVal != null) lastVal
          else if (firstKey == lastKey) carries(pid)
          else null
        prevIdx = pid
      }
    }
    val bc = session.sparkContext.broadcast(carries)
    // pass B: one streaming sweep per sorted partition, seeded from the
    // broadcast carry (which applies only until the first key changes).
    // Unfilled rows pass through as the plan's own rows; filled rows
    // are rebuilt as GenericInternalRows (fields other than the fill
    // still reference the live buffer — consumed before the next pull).
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first = true
      var curKey: Any = null
      var curVal: Any = bc.value(pid)
      it.map { r =>
        val k = keyOf(r)
        if (first) {
          first = false
          curKey = InternalRow.copyValue(k)
        } else if (k != curKey) {
          curKey = InternalRow.copyValue(k); curVal = null
        }
        if (!r.isNullAt(fillIdx)) {
          curVal = InternalRow.copyValue(r.get(fillIdx, fillType))
          r
        } else if (curVal == null) r
        else {
          val vals = new Array[Any](numFields)
          var i = 0
          while (i < numFields) {
            vals(i) = if (r.isNullAt(i)) null else r.get(i, fieldTypes(i))
            i += 1
          }
          vals(fillIdx) = curVal
          new GenericInternalRow(vals)
        }
      }
    }
    PlanShim.internalCreateDataFrame(session, filled, schema)
  }
}
