package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive width for the sweep operators' range shuffles
  * ([[graft.operators.RangeFill]], the merge/coverage breakpoint
  * sweeps).
  *
  * Why (guide §2.2 — fewer, larger partitions; §2 — derive the width
  * from the input, not a constant): the sweeps always shuffled into
  * the session's `spark.sql.shuffle.partitions`. That constant is
  * right for a cluster-sized input and wrong for a small one — a
  * 6k-row timeline paid 32 shuffle tasks, 32 sort tasks, a 32-entry
  * pass-A summary job AND `RangePartitioner`'s boundary-sampling job
  * (itself a full evaluation of the upstream decode, ~100 samples per
  * output partition). Deriving the width from the plan's size
  * ESTIMATE costs no job: `LogicalPlan.stats.sizeInBytes` propagates
  * file sizes through projections and unions. A one-partition range
  * shuffle skips the sampling job entirely (`RangePartitioner` takes
  * `partitions <= 1` bounds-free), which removes one full upstream
  * evaluation from every small sweep.
  *
  * Inputs whose size the planner cannot estimate (foreign DSv2 scans
  * without statistics surface `defaultSizeInBytes` = huge) keep the
  * caller's width unchanged — at 100 TB nothing changes; the
  * adaptation only ever NARROWS a provably small shuffle. Results are
  * identical at any width (the sweeps' carry logic is
  * width-independent); only task counts change.
  *
  * An earlier r22 variant hand-rolled the whole range exchange with
  * bounds from a column-pruned sampling plan (kill the sampling
  * pass's full decode at ANY size). Same-window A/B said it was
  * 1.15-1.7x WORSE across the family: per-query analysis + codegen of
  * the extra sampling plan and the post-shuffle re-projection layer
  * cost more than the decode they saved, at every input size tried
  * (gates and the 26M-row b13b timeline alike). Documented in
  * OPTIMIZATION_r22.md; do not repeat.
  */
object RangeShuffle {

  /** Target bytes per range partition for the adaptive width; `0`
    * disables the adaptation (always the caller's n). The default is
    * deliberately FAR below the guide's 100 MB-1 GB cluster guidance,
    * because the adaptation only ever narrows provably tiny shuffles:
    * a same-JVM A/B over the closest family (r22) measured 1 MB best
    * (q77 1.59 s vs 1.70 s at the caller's 32 and 2.75 s collapsed to
    * one partition — the sweeps want parallelism down to ~50k rows per
    * task, so narrowing must stay gentle). Inputs above
    * n x bytesPerPartition — any real cluster load — are untouched;
    * production tuning happens through `spark.sql.shuffle.partitions`
    * as before. */
  val BytesPerPartitionKey = "spark.graft.range.bytesPerPartition"
  val BytesPerPartitionDefault: Long = 1L << 20

  /** `min(n, ceil(sizeEstimate / bytesPerPartition))`, or `n` when the
    * estimate is unusable (unknown-stats scans report huge). */
  def adaptivePartitions(df: DataFrame, n: Int): Int = {
    val conf = df.sparkSession.conf
    val bytesPerPart = try {
      conf.get(BytesPerPartitionKey, BytesPerPartitionDefault.toString)
        .toLong
    } catch { case _: NumberFormatException => BytesPerPartitionDefault }
    if (bytesPerPart <= 0L) return n
    val size =
      try df.queryExecution.analyzed.stats.sizeInBytes
      catch { case _: Throwable => return n }
    // an unknown-stats source poisons the whole estimate upward: only
    // narrow when the estimate is credibly small (far below any value
    // defaultSizeInBytes could contribute)
    if (size <= 0 || size >= BigInt(bytesPerPart) * n) n
    else math.max(1, ((size + bytesPerPart - 1) / bytesPerPart).toInt)
  }

  /** `df.repartitionByRange(adaptiveN, partExprs)` + local sort by
    * `partExprs ++ localSortExprs` — the sweep operators' standard
    * pre-pass shape with the width adapted to the input estimate.
    * `adapt = false` pins the caller's n exactly (operators pass it
    * when the user gave an EXPLICIT partition count — explicit beats
    * heuristic, the same convention Spark's AQE applies to explicit
    * repartitions). */
  def rangeSortedDf(df: DataFrame, partExprs: Seq[Column],
      localSortExprs: Seq[Column], n: Int,
      adapt: Boolean = true): DataFrame =
    df.repartitionByRange(
        if (adapt) adaptivePartitions(df, n) else n, partExprs: _*)
      .sortWithinPartitions(partExprs ++ localSortExprs: _*)
}
