package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join.
  *
  * The reference defines overlap semantics per record via its index-query
  * re-check (`/root/reference/oxbow/src/alignment/scanner/batch_iterator/
  * query.rs:142-159`: zero-based half-open `a.start < b.end && b.start <
  * a.end` on the same sequence) but delegates the *join* itself to
  * downstream engines. Here it becomes a first-class distributed operator.
  *
  * Strategy (the CSI-binning idea from `util/index.rs` applied to a shuffle
  * plan): explode each interval into the fixed-width genomic bins it covers,
  * shuffle both sides on `(chrom, bin)` — an equi-join Catalyst can plan as
  * a hash join — then apply the exact overlap predicate as a residual
  * filter. A pair that overlaps in several shared bins would be emitted
  * once per bin, so we keep only the bin that owns the pair: the bin of
  * `max(a.start, b.start)`. This makes the output exactly the overlap-join
  * result with no `distinct` (no second shuffle).
  *
  * Long intervals are NOT exploded without bound (mirroring CSI's coarse
  * levels, `/root/reference/oxbow/src/util/index.rs:78-115`): a row longer
  * than `binSize * maxBinsPerRow` skips the fine bins and lands in one of
  * two per-chromosome coarse channels encoded as sentinel bins:
  *
  *  - bin -1: long LEFT rows × ALL right rows
  *  - bin -2: ALL left rows × long RIGHT rows (ownership keeps only
  *    short-left pairs here, so long×long pairs match exactly once in -1)
  *
  * The channels are asymmetric on purpose — each coarse bucket has the
  * long rows of one side as its build side, so when no over-long interval
  * exists the coarse hash joins build empty tables and enumerate nothing.
  * Worst case is `n_long × n` pairs per chromosome, the honest cost of
  * chromosome-arm-scale intervals, instead of an unbounded `len/binSize`
  * row explosion (a 10 Mbp annotation would otherwise emit 10,000 rows).
  *
  * Scale properties: both sides shuffle once on the bin key; no broadcast
  * required; skewed hot bins can be handled by AQE skew-join splitting
  * since the join is a plain equi-join after the explode. Explode factor is
  * `min(len/binSize, maxBinsPerRow) + 1` per row — pick `binSize` near the
  * typical interval length so the factor stays ~2.
  */
object IntervalJoin {

  /** Overlap-join two interval DataFrames.
    *
    * Each side must carry `chrom/start/end` columns (zero-based half-open)
    * named via the triples. All other columns are preserved; supply
    * disambiguated names upstream.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftCols: (String, String, String) = ("chrom", "start", "end"),
      rightCols: (String, String, String) = ("chrom", "start", "end"),
      binSize: Long = 1000L,
      maxBinsPerRow: Int = 1024): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    val (lc, ls, le) = leftCols
    val (rc, rs, re) = rightCols
    val capLen = binSize * maxBinsPerRow

    def fineBins(s: String, e: String): Column =
      sequence(
        floor(col(s) / binSize),
        // end is exclusive: last occupied base is end-1
        floor((col(e) - 1) / binSize))

    // short rows: fine bins + the side's "all rows" coarse channel;
    // long rows: both coarse channels only (bounded, never Sequence'd)
    def binned(df: DataFrame, s: String, e: String, allChannel: Long) =
      df.withColumn("__bin",
        explode(when(col(e) - col(s) <= capLen,
          concat(fineBins(s, e), array(lit(allChannel))))
          .otherwise(array(lit(-1L), lit(-2L)))))

    val l = binned(left, ls, le, allChannel = -2L)
    val r = binned(right, rs, re, allChannel = -1L)

    // ownership: fine bins dedup on max(starts); channel -1 (long-left ×
    // all-right) is already unique; channel -2 keeps only short-left pairs
    val ownership =
      when(l("__bin") >= 0, l("__bin") === floor(greatest(l(ls), r(rs)) / binSize))
        .when(l("__bin") === -1L, lit(true))
        .otherwise(l(le) - l(ls) <= capLen)

    val joined = l.join(r,
      l(lc) === r(rc) && l("__bin") === r("__bin") &&
        l(ls) < r(re) && r(rs) < l(le) && ownership)

    joined.drop("__bin")
  }

  /** Multi-resolution summary rollup — the Spark-native equivalent of BBI
    * zoom records (`/root/reference/oxbow/src/bbi/model/zoom.rs:13-37`:
    * chrom, start, end, bases_covered, min, max, sum, sum_squares).
    *
    * A plain partial-aggregating `groupBy`, so it map-side combines before
    * the shuffle; at 100 TB this is a single shuffle of `nBins` rows.
    */
  def zoomRollup(
      intervals: DataFrame,
      resolution: Long,
      chrom: String = "chrom",
      start: String = "start",
      end: String = "end",
      value: Option[String] = None): DataFrame = {
    val v = value.map(col).getOrElse(col(end) - col(start))
    intervals
      .groupBy(col(chrom), (floor(col(start) / resolution) * resolution)
        .cast("long").as("bin_start"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col(end) - col(start)).cast("long").as("bases_covered"),
        min(v).as("min_val"),
        max(v).as("max_val"),
        sum(v).as("sum_val"),
        sum(v * v).as("sum_squares"))
      .withColumn("bin_end", col("bin_start") + resolution)
  }
}
