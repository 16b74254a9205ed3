package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-set algebra over (chrom, start, end) frames — the
  * bedtools-merge family the reference leaves to downstream engines
  * (its own surface stops at indexed scans; see
  * `/root/reference/oxbow/src/util/index.rs` for the binning it uses
  * internally).
  *
  * Scale shape: one shuffle to order each chromosome's intervals, then a
  * running-maximum sweep — the textbook window formulation Catalyst
  * executes with partial windows and no driver state. Chromosome count
  * bounds parallelism of the window stage; genomic data has enough
  * chromosomes/contigs to keep a cluster busy, and a salt column can
  * split a pathological single-contig load at the cost of a second
  * merge pass over the salt boundaries.
  */
object IntervalOps {

  /** Merge overlapping or book-ended (`end == start`, half-open abutting)
    * intervals per chromosome: the minimal set of disjoint intervals
    * covering the input, with the count of source rows per merged
    * interval. Zero-length and inverted rows participate as points at
    * `start`. */
  def mergeIntervals(df: DataFrame, chrom: String = "chrom",
      start: String = "start", end: String = "end"): DataFrame = {
    val ord = Window.partitionBy(col(chrom)).orderBy(col(start), col(end))
    // the running max of `end` over all PRIOR rows; a new merged group
    // starts where the current start exceeds it (strictly: half-open
    // intervals touching at a point still merge)
    val prevMax = max(greatest(col(end), col(start)))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = df
      .withColumn("__new_grp",
        when(prevMax.isNull || col(start) > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new_grp")).over(ord))
    grouped
      .groupBy(col(chrom), col("__grp"))
      .agg(
        min(col(start)).as("start"),
        max(greatest(col(end), col(start))).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__grp")
  }
}
