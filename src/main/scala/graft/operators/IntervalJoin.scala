package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale properties: both sides shuffle once on the bin key; no broadcast
  * required; skewed hot bins can be handled by AQE skew-join splitting
  * since the join is a plain equi-join after the explode. Explode factor is
  * `len/binSize + 1` per row — pick `binSize` near the typical interval
  * length so the factor stays ~2.
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
      binSize: Long = 1000L): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val (lc, ls, le) = leftCols
    val (rc, rs, re) = rightCols

    def binned(df: DataFrame, c: String, s: String, e: String) =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(s) / binSize),
          // end is exclusive: last occupied base is end-1
          floor((col(e) - 1) / binSize))))

    val l = binned(left, lc, ls, le)
    val r = binned(right, rc, rs, re)

    val joined = l.join(r,
      l(lc) === r(rc) && l("__bin") === r("__bin") &&
        l(ls) < r(re) && r(rs) < l(le) &&
        // ownership: emit only from the bin containing max(starts)
        l("__bin") === floor(greatest(l(ls), r(rs)) / binSize))

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
