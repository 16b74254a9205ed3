package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce, EqualTo, EvalMode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, Literal, Or, Pmod, Subtract}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

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
  * two per-chromosome coarse channels encoded as sentinel bins
  * (`Long.MinValue` and `Long.MinValue + 1`, unreachable by any fine bin
  * even with negative coordinates):
  *
  *  - LONG_LEFT: long LEFT rows × ALL right rows
  *  - LONG_RIGHT: ALL left rows × long RIGHT rows (ownership keeps only
  *    short-left pairs here, so long×long pairs match exactly once in
  *    LONG_LEFT)
  *
  * The channels are asymmetric on purpose — each coarse bucket has the
  * long rows of one side as its build side — and a side emits its
  * "all rows" channel copy ONLY when the opposite side actually contains
  * a long row (a broadcast one-row aggregate decides at run time), so in
  * the common all-short case nothing shuffles into the coarse channels at
  * all. Worst case is `n_long × n` pairs per chromosome, the honest cost
  * of chromosome-arm-scale intervals, instead of an unbounded
  * `len/binSize` row explosion (a 10 Mbp annotation would otherwise emit
  * 10,000 rows).
  *
  * Degenerate rows: `end <= start` rows get the single bin of `start`,
  * which is provably the ownership bin of every pair the raw predicate
  * admits (a partner with `r.start < l.end && l.start < r.end` must cover
  * `[l.end, l.start]`, hence `start`'s bin). Zero-length insertion points
  * therefore match partners that strictly span them (the bedtools
  * convention), inverted rows keep the exact raw-predicate semantics of a
  * naive join, and neither can trigger an unbounded descending explode.
  *
  * Scale properties: both sides shuffle once on the bin key; no broadcast
  * required; skewed hot bins can be handled by AQE skew-join splitting
  * since the join is a plain equi-join after the explode. Explode factor is
  * `min(len/binSize, maxBinsPerRow) + 1` per row — pick `binSize` near the
  * typical interval length so the factor stays ~2. The long-row existence
  * probes cost one extra columnar scan per side (a map-side-combined
  * max aggregate) — cheap next to the shuffle they can eliminate.
  */
object IntervalJoin {

  /** Coarse-channel sentinel bins. Fine bins are `floor(coord/binSize)`
    * computed in exact integer arithmetic (see [[floorDivExpr]]): for any
    * `binSize >= 2` the smallest reachable fine bin is
    * `floor(Long.MinValue / binSize) >= Long.MinValue / 2`, so the
    * sentinels are unreachable for EVERY coordinate (at `binSize = 1`
    * only the two coordinates equal to the sentinels themselves would
    * collide — out of any genomic domain). */
  val LongLeftChannel: Long = Long.MinValue
  val LongRightChannel: Long = Long.MinValue + 1

  /** Exact OVERFLOW-SAFE integer floor division, shared by the operator
    * and [[graft.plans.IntervalJoinRewrite]] so the two binning paths
    * can never drift. Truncating `IntegralDivide` equals floor when
    * `v >= 0` or the division is exact; otherwise floor = trunc − 1.
    * (The earlier `(v - pmod(v, d)) / d` form subtracted below
    * `Long.MinValue` for coordinates within `d` of it, wrapping the bin
    * sign and feeding `Sequence` an astronomic descending range;
    * double-based `floor(v / d)` loses bin precision past 2^53.) */
  private[graft] def floorDivExpr(v: Expression, d: Long): Expression = {
    val trunc = new IntegralDivide(v, Literal(d))
    CaseWhen(Seq((
      Or(GreaterThanOrEqual(v, Literal(0L)),
        EqualTo(new Pmod(v, Literal(d)), Literal(0L))), trunc)),
      Some(Subtract(trunc, Literal(1L))))
  }

  /** The long-row classifier, shared with the rewrite rule: `e − s`
    * overflows Long for spans crossing huge magnitudes (negative start,
    * end near Long.MaxValue — both supported inputs); TRY-mode
    * subtraction yields null there, and a null length with `e > s` can
    * only mean "astronomically long". */
  private[graft] def isLongExpr(s: Expression, e: Expression,
      capLen: Long): Expression = {
    val diff = Subtract(e, s, EvalMode.TRY)
    Coalesce(Seq(GreaterThan(diff, Literal(capLen)), GreaterThan(e, s)))
  }

  private def floorDiv(c: Column, d: Long): Column =
    ColumnShim.column(
      floorDivExpr(ColumnShim.expression(c.cast("long")), d))

  /** Overlap-join two interval DataFrames.
    *
    * Each side must carry `chrom/start/end` columns (zero-based half-open)
    * named via the triples. All other columns are preserved; supply
    * disambiguated names upstream.
    *
    * Determinism assumption: the long-row existence probes re-scan each
    * input as a separate subplan, so inputs must produce the same rows on
    * re-evaluation (true for files/tables). For non-deterministic inputs
    * (e.g. a `rand()` filter), `cache()`/`localCheckpoint()` the frames
    * first, or a long row visible only to the join scan would find no
    * gated coarse partners.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftCols: (String, String, String) = ("chrom", "start", "end"),
      rightCols: (String, String, String) = ("chrom", "start", "end"),
      binSize: Long = 1000L,
      maxBinsPerRow: Int = 1024,
      strand: Strandedness = Strandedness.Ignore,
      minOverlapFracLeft: Double = 0.0,
      minOverlapFracRight: Double = 0.0): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    require(minOverlapFracLeft >= 0.0 && minOverlapFracLeft <= 1.0,
      s"minOverlapFracLeft must be in [0, 1], got $minOverlapFracLeft")
    require(minOverlapFracRight >= 0.0 && minOverlapFracRight <= 1.0,
      s"minOverlapFracRight must be in [0, 1], got $minOverlapFracRight")
    // an overflowing product would wrap capLen negative, classify EVERY
    // row as long, and silently turn the scale path into the quadratic
    // per-chromosome shuffle it exists to avoid
    require(binSize <= Long.MaxValue / maxBinsPerRow,
      s"binSize * maxBinsPerRow overflows: $binSize * $maxBinsPerRow")
    val (lc, ls, le) = leftCols
    val (rc, rs, re) = rightCols
    val capLen = binSize * maxBinsPerRow
    val emptyBins = array().cast("array<bigint>")
    // working-column names picked to miss BOTH inputs' columns: a
    // caller frame already carrying e.g. "__bin" would otherwise be
    // silently overwritten by the withColumn and then dropped from the
    // output. Case-INSENSITIVE, because withColumn/drop resolve
    // case-insensitively under the default spark.sql.caseSensitive=
    // false — a case-sensitive probe would accept "__bin" against a
    // user column "__BIN" and still clobber it.
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !left.columns.exists(_.equalsIgnoreCase(n)) &&
          !right.columns.exists(_.equalsIgnoreCase(n)))
        .get
    val binCol = fresh("__bin")
    val rLongCol = fresh("__graft_r_long")
    val lLongCol = fresh("__graft_l_long")

    // e - s overflows Long (an ANSI-mode error) for spans crossing huge
    // magnitudes — negative start with end near Long.MaxValue, both
    // supported inputs; try_subtract yields null there, and a null
    // length with e > s can only mean "astronomically long"
    def isLong(s: Column, e: Column): Column =
      ColumnShim.column(isLongExpr(ColumnShim.expression(s),
        ColumnShim.expression(e), capLen))

    def fineBins(s: String, e: String): Column =
      when(col(e) > col(s),
        sequence(
          floorDiv(col(s), binSize),
          // end is exclusive: last occupied base is end-1
          floorDiv(col(e) - 1, binSize)))
        // end <= start: the single bin of `start` — the only possible
        // ownership bin of any raw-predicate match (partner spans it);
        // also prevents Spark's descending `sequence` explode
        .otherwise(array(floorDiv(col(s), binSize)))

    // long rows: both coarse channels only (bounded, never Sequence'd);
    // everything else: fine bins + the side's "all rows" coarse copy,
    // emitted only if the opposite side has a long row to meet there
    def binned(df: DataFrame, s: String, e: String, allChannel: Long,
        oppHasLong: Column) =
      df.withColumn(binCol, explode(
        when(isLong(col(s), col(e)),
          array(lit(LongLeftChannel), lit(LongRightChannel)))
          .otherwise(concat(fineBins(s, e),
            when(oppHasLong, array(lit(allChannel))).otherwise(emptyBins)))))

    // one-row existence probes, broadcast into each side's explode
    val rightHasLong = right.agg(
      coalesce(max(when(isLong(col(rs), col(re)), 1L).otherwise(0L)) === 1L,
        lit(false)).as(rLongCol))
    val leftHasLong = left.agg(
      coalesce(max(when(isLong(col(ls), col(le)), 1L).otherwise(0L)) === 1L,
        lit(false)).as(lLongCol))

    // subquery aliases + qualified refs, NOT l(col)/r(col) attribute
    // refs: with shared-lineage inputs (overlapJoin(df, df) — the
    // standard pairs-within-one-set use) both sides carry identical
    // attribute ids, and df(col) either throws AMBIGUOUS_SELF_JOIN or
    // resolves both comparison sides to the left attribute
    val l = binned(left.crossJoin(broadcast(rightHasLong)), ls, le,
      allChannel = LongRightChannel, oppHasLong = col(rLongCol))
      .alias("__graft_ij_l")
    val r = binned(right.crossJoin(broadcast(leftHasLong)), rs, re,
      allChannel = LongLeftChannel, oppHasLong = col(lLongCol))
      .alias("__graft_ij_r")
    def L(c: String): Column = col(s"__graft_ij_l.$c")
    def R(c: String): Column = col(s"__graft_ij_r.$c")

    // ownership: fine bins dedup on max(starts); LONG_LEFT (long-left ×
    // all-right) is already unique; LONG_RIGHT keeps only short-left pairs
    val ownership =
      when(L(binCol) === LongLeftChannel, lit(true))
        .when(L(binCol) === LongRightChannel, !isLong(L(ls), L(le)))
        .otherwise(L(binCol) === floorDiv(greatest(L(ls), R(rs)), binSize))

    // bedtools -s/-S: a residual equi/pair predicate inside the join
    // condition (strand columns must exist on their sides with
    // non-colliding names, like every other carried column). Null
    // strands never match — the predicate-based policy.
    val strandCond = strand match {
      case Strandedness.Ignore => lit(true)
      case Strandedness.Same(ac, bc) => L(ac) === R(bc)
      case Strandedness.Opposite(ac, bc) =>
        (L(ac) === "+" && R(bc) === "-") ||
          (L(ac) === "-" && R(bc) === "+")
    }
    // bedtools -f/-F (-r = both): minimum overlap as a fraction of a
    // side's length, evaluated on the exact clipped overlap. A zero
    // threshold is the plain >= 1-base predicate (already implied by
    // the strict raw predicate); degenerate zero-length sides match
    // under the raw predicate's own rules and are unaffected by a
    // zero threshold (0 >= f * 0 holds).
    //
    // Precision contract: the comparison is double arithmetic, exact
    // whenever f * length is — always true for dyadic f (0.5, 0.25)
    // and for any f while length < 2^53 / denominator(f). Intervals
    // long enough to push f * length past 2^53 can flip a
    // boundary-EQUAL overlap across the >=; bedtools itself computes
    // the threshold in floating point the same way, so this matches
    // the tool rather than an exact rational evaluation.
    val ovl = (least(L(le), R(re)) - greatest(L(ls), R(rs)))
      .cast("double")
    val fracCond =
      (if (minOverlapFracLeft > 0.0)
        ovl >= lit(minOverlapFracLeft) *
          (L(le) - L(ls)).cast("double")
      else lit(true)) &&
      (if (minOverlapFracRight > 0.0)
        ovl >= lit(minOverlapFracRight) *
          (R(re) - R(rs)).cast("double")
      else lit(true))

    val joined = l.join(r,
      L(lc) === R(rc) && L(binCol) === R(binCol) &&
        L(ls) < R(re) && R(rs) < L(le) && ownership &&
        strandCond && fracCond)

    joined.drop(binCol, rLongCol, lLongCol)
  }

  /** Multi-resolution summary rollup — the Spark-native equivalent of BBI
    * zoom records (`/root/reference/oxbow/src/bbi/model/zoom.rs:13-37`:
    * chrom, start, end, bases_covered, min, max, sum, sum_squares),
    * with BBI's CLIPPED per-base accounting: a record contributes to
    * EVERY bin it overlaps, `bases_covered` counts only the bases
    * inside each bin (it can never exceed the bin width), and
    * sum/sum_squares accumulate `value · covered_bases` /
    * `value² · covered_bases` the way zoom sumData/sumSquares do. A
    * start-bin-only attribution (the pre-r13 shape) misreported any
    * record longer than the resolution: its whole span landed in one
    * bin and the bins it actually crossed showed zero coverage.
    *
    * `value` is the record's per-base value (wig-style), cast to
    * double; when absent it defaults to 1.0, making the rollup a pure
    * coverage summary (`sum_val == bases_covered`). min/max are over
    * contributing records' values, like zoom minVal/maxVal.
    *
    * Scale shape: one `explode(sequence(startBin, endBin))` per record
    * (spans/resolution elements — zoom rollups pick resolutions within
    * ~2 orders of magnitude of the feature length, so small), then a
    * plain partial-aggregating `groupBy` that map-side combines before
    * the shuffle; at 100 TB this is a single shuffle of `nBins` rows.
    * Degenerate rows (`end <= start`) cover no bases and are dropped.
    */
  def zoomRollup(
      intervals: DataFrame,
      resolution: Long,
      chrom: String = "chrom",
      start: String = "start",
      end: String = "end",
      value: Option[String] = None): DataFrame = {
    // a zero resolution would floorDiv every row into a null bin (one
    // garbage group) in non-ANSI mode instead of erroring
    require(resolution > 0, "resolution must be positive")
    val v = value.map(col(_).cast("double")).getOrElse(lit(1.0))
    val binned = intervals
      .where(col(end) > col(start))
      .withColumn("__zr_v", v)
      .withColumn("__zr_bin", explode(sequence(
        floorDiv(col(start), resolution),
        floorDiv(col(end) - 1, resolution))))
    val binStart = col("__zr_bin") * resolution
    val covered = (least(col(end), binStart + resolution) -
      greatest(col(start), binStart)).cast("double")
    binned
      .groupBy(col(chrom), binStart.cast("long").as("bin_start"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(covered).cast("long").as("bases_covered"),
        min(col("__zr_v")).as("min_val"),
        max(col("__zr_v")).as("max_val"),
        sum(col("__zr_v") * covered).as("sum_val"),
        sum(col("__zr_v") * col("__zr_v") * covered).as("sum_squares"))
      .withColumn("bin_end", col("bin_start") + resolution)
  }
}
