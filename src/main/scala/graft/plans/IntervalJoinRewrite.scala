package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule rescuing naive interval-overlap joins.
  *
  * A genomic overlap join written directly —
  * `a.chrom = b.chrom AND a.start < b.end AND b.start < a.end` —
  * has a single equality key, so Catalyst plans a sort-merge join on
  * `chrom` alone: with a handful of chromosomes that is a near-cartesian
  * pairing per chromosome, quadratic at scale. This rule rewrites the
  * logical join into the binned form of
  * [[graft.operators.IntervalJoin.overlapJoin]]: explode both sides into
  * fixed-width bins (a `Generate` per side), join on
  * `(chrom, bin)` — a proper equi-join Catalyst hash-partitions and AQE
  * can skew-split — and keep the exact overlap predicate plus a
  * bin-ownership check (`bin == bin(max(starts))`) so each overlapping
  * pair is emitted exactly once, no distinct needed.
  *
  * Two guards keep the rewrite from firing where it would hurt:
  *
  *  1. **Key-column allowlist.** The single equality's column names (both
  *     sides, lowercased, trailing digits/underscores stripped) must appear
  *     in `spark.graft.intervalJoin.keyColumns` — by default the genomic
  *     sequence-name conventions. A timestamp band join
  *     (`a.key = b.key AND lo < ts AND ts < hi` over epoch numbers) can
  *     therefore never match; users opt in other schemas by listing their
  *     key column names.
  *  2. **Bounded explode.** Rows longer than `binSize * maxBinsPerRow`
  *     skip the fine bins and land in two per-chromosome coarse channels
  *     (sentinel bins `Long.MinValue` / `Long.MinValue + 1`, unreachable
  *     by fine bins even for negative coordinates; asymmetric:
  *     long-left×all-right and all-left×long-right, mirroring CSI's
  *     coarse levels, `/root/reference/oxbow/src/util/index.rs:78-115`).
  *     An open-ended sentinel interval (end = Long.MaxValue) costs 2 rows
  *     instead of overflowing `Sequence`. A side ships its "all rows"
  *     coarse copy only when the opposite side actually contains a long
  *     row: an uncorrelated scalar subquery (`max(end-start) > cap`) per
  *     side — the logical-plan mirror of the operator's broadcast
  *     one-row probe — decides at run time, so the common all-short case
  *     shuffles nothing into the coarse channels. Set
  *     `spark.graft.intervalJoin.coarseChannels=on` to restore the
  *     unconditional copies (skips the two probe subqueries). The
  *     probes require deterministic inputs (they re-evaluate each side
  *     as a separate subplan), so the rule BAILS on joins whose sides
  *     contain a Sample node or any non-deterministic expression — an
  *     automatic rewrite must never change results, and the operator
  *     API documents the same assumption as a caller contract.
  *
  * Degenerate rows mirror the operator: `end <= start` gets the single
  * bin of `start` — provably the ownership bin of every pair the raw
  * predicate admits — so zero-length and inverted rows keep the exact
  * semantics of the un-rewritten join (an optimizer rule must not change
  * results) without Spark's descending-`sequence` explode.
  *
  * Fires only on inner joins whose condition has EXACTLY one
  * attribute-attribute equality (the chrom key) and the two strict
  * range comparisons in opposite directions over integral columns —
  * after the rewrite the join has two equality keys, so the rule never
  * re-fires.
  *
  * Config: `spark.graft.intervalJoin.binSize` (default 1000; 0 disables),
  * `spark.graft.intervalJoin.maxBinsPerRow` (default 1024),
  * `spark.graft.intervalJoin.keyColumns` (comma-separated allowlist).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.intervalJoin.binSize"
  val MaxBinsKey = "spark.graft.intervalJoin.maxBinsPerRow"
  val KeyColumnsKey = "spark.graft.intervalJoin.keyColumns"
  /** "auto" (default): runtime existence probes gate the coarse copies;
    * "on": unconditional copies, no probe subqueries. */
  val CoarseChannelsKey = "spark.graft.intervalJoin.coarseChannels"

  val DefaultKeyColumns: String =
    "chrom,chromosome,chr,contig,rname,seqid,seqname,refname,reference_name"

  private def confLong(key: String, default: Long): Long =
    try SQLConf.get.getConfString(key, default.toString).toLong
    catch { case _: NumberFormatException => default }

  private def keyAllowlist: Set[String] =
    SQLConf.get.getConfString(KeyColumnsKey, DefaultKeyColumns)
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

  /** "chrom2", "CHROM_1" → "chrom": the allowlist matches disambiguated
    * self-join aliases too. */
  private def normalizeName(n: String): String =
    n.toLowerCase.reverse.dropWhile(c => c.isDigit || c == '_').reverse

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bs = confLong(BinSizeKey, 1000L)
    val maxBins = confLong(MaxBinsKey, 1024L)
    // the overflow check mirrors IntervalJoin.overlapJoin's require: a
    // wrapped-negative capLen would classify every row as long and turn
    // the rewrite into the quadratic coarse plan it exists to avoid —
    // an optimizer rule must bail out, not throw, on a bad conf pair
    if (bs <= 0 || maxBins <= 0 || bs > Long.MaxValue / maxBins) plan
    else {
      val allowed = keyAllowlist
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) =>
          rewrite(j, bs, maxBins, allowed).getOrElse(j)
      }
    }
  }

  private def rewrite(j: Join, bs: Long, maxBins: Long,
      allowed: Set[String]): Option[LogicalPlan] = {
    val left = j.left
    val right = j.right
    def isLeft(a: Attribute): Boolean = left.outputSet.contains(a)
    def isRight(a: Attribute): Boolean = right.outputSet.contains(a)

    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val attrEqs = conjuncts.collect {
      case e @ EqualTo(a: AttributeReference, b: AttributeReference)
        if (isLeft(a) && isRight(b)) || (isRight(a) && isLeft(b)) => e
    }
    if (attrEqs.size != 1) return None
    // opt-in gate: both equality column names must be allowlisted
    val eqNames = attrEqs.head.references.toSeq.map(a => normalizeName(a.name))
    if (!eqNames.forall(allowed)) return None

    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // the analyzer wraps mixed-width integral comparisons in Cast
    // (int start vs long end), so matching bare attributes only would
    // silently leave those joins un-rewritten and quadratic. Only
    // WIDENING casts may unwrap: a user-written narrowing cast (e.g.
    // CAST(longStart AS INT) < end) changes the compared value for
    // out-of-range inputs (wrap, or ANSI error), so rewriting it to
    // bin/compare the full-width attribute would silently change join
    // semantics — those joins are left to the generic paths.
    def width(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 4; case LongType => 8; case _ => 0
    }
    object IntegralAttr {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference if integral(a.dataType) => Some(a)
        case c: Cast => c.child match {
          case a: AttributeReference
            if integral(a.dataType) && integral(c.dataType) &&
              width(c.dataType) >= width(a.dataType) => Some(a)
          case _ => None
        }
        case _ => None
      }
    }
    // GreaterThan is collected flipped: Catalyst has no canonicalization
    // rule turning `b.end > a.start` into `a.start < b.end` at this
    // point, and both spellings of the overlap predicate are common
    val lts = conjuncts.collect {
      case LessThan(IntegralAttr(a), IntegralAttr(b)) => (a, b)
      case GreaterThan(IntegralAttr(b), IntegralAttr(a)) => (a, b)
    }
    // a.start < b.end (left attr < right attr) and b.start < a.end.
    // EXACTLY one candidate per direction: with a second cross-side
    // inequality in the same direction (say an id tiebreaker
    // a.read_id < b.read_id) a .find could latch onto the wrong pair
    // as the interval bounds — results would stay correct (the raw
    // conjuncts are all kept) but every row could classify long and
    // the "rescue" would degrade to the naive per-chromosome pairing
    // plus probe/explode overhead. Ambiguous shapes keep their plan.
    val lsReAll = lts.filter { case (a, b) => isLeft(a) && isRight(b) }
    val rsLeAll = lts.filter { case (a, b) => isRight(a) && isLeft(b) }
    // the probes (and the join scan) re-evaluate each side as separate
    // subplans: for a non-deterministic side (sample, rand() filter)
    // the probe's long-row answer can disagree with the join scan's
    // rows, silently dropping short×long pairs. An automatic rule must
    // not change results — bail instead (the operator API documents
    // the same assumption as a caller contract).
    def nondeterministic(p: LogicalPlan): Boolean =
      p.exists {
        case _: Sample => true
        case node => node.expressions.exists(e => !e.deterministic)
      }
    if (nondeterministic(left) || nondeterministic(right)) return None
    (lsReAll, rsLeAll) match {
      case (Seq(o1), Seq(o2)) =>
        val ls = o1._1; val le = o2._2
        val rs = o2._1; val re = o1._2

        val chLongLeft = graft.operators.IntervalJoin.LongLeftChannel
        val chLongRight = graft.operators.IntervalJoin.LongRightChannel
        def asLong(e: Expression): Expression =
          if (e.dataType == LongType) e else Cast(e, LongType)
        // binning + long-row classification come from the ONE shared
        // Expression-level definition in the operator
        // (IntervalJoin.floorDivExpr / isLongExpr) — overflow-safe for
        // coordinates within binSize of Long.MinValue, and immune to
        // the operator/rule drift a second copy invites
        def binOf(e: Expression): Expression =
          graft.operators.IntervalJoin.floorDivExpr(asLong(e), bs)
        val capLen = bs * maxBins
        def isLong(s: Expression, e: Expression): Expression =
          graft.operators.IntervalJoin.isLongExpr(asLong(s), asLong(e),
            capLen)

        // runtime long-row existence probe of one side: an uncorrelated
        // scalar subquery the physical planner executes once and
        // inlines. The explicit coordinate Project matters: the
        // optimizer's Subquery batch has already run by the time this
        // rule fires, so no ColumnPruning will ever reach the probe's
        // plan — without the Project it would re-scan every column of
        // the side (seq/qual dominate BAM-shaped rows) for a two-column
        // aggregate.
        val coarseMode =
          SQLConf.get.getConfString(CoarseChannelsKey, "auto")
        def hasLongProbe(side: LogicalPlan, s: AttributeReference,
            e: AttributeReference): Expression =
          if (coarseMode == "on") Literal(true)
          else ScalarSubquery(Aggregate(Nil, Seq(Alias(
            Coalesce(Seq(
              GreaterThanOrEqual(
                Max(If(isLong(s, e), Literal(1L), Literal(0L)))
                  .toAggregateExpression(),
                Literal(1L)),
              Literal(false))), "__graft_has_long")()),
            Project(Seq(s, e).distinct, side)))

        // containsNull=false to exactly match CreateArray/Sequence output
        // types (post-analysis expressions get no coercion pass)
        val emptyBins = Literal.create(Seq.empty[Long],
          ArrayType(LongType, containsNull = false))
        // long rows: the two coarse channels only; end <= start rows: the
        // single start bin (semantics-preserving, explode-safe); ordinary
        // short rows: covering fine bins; both short shapes also ship the
        // side's "all rows" coarse copy — but only when the opposite side
        // has a long row to meet there
        def keys(s: Expression, e: Expression, allChannel: Long,
            oppHasLong: Expression): Expression = {
          val allCopy = If(oppHasLong,
            CreateArray(Seq(Literal(allChannel))), emptyBins)
          CaseWhen(Seq(
            (isLong(s, e),
              CreateArray(Seq(Literal(chLongLeft), Literal(chLongRight)))),
            (GreaterThan(asLong(e), asLong(s)),
              Concat(Seq(
                new Sequence(binOf(s), binOf(Subtract(asLong(e), Literal(1L))))
                  .withTimeZone(conf.sessionLocalTimeZone),
                allCopy)))),
            Some(If(IsNull(asLong(s)), emptyBins,
              Concat(Seq(CreateArray(Seq(binOf(s))), allCopy)))))
        }

        val binL = AttributeReference("__graft_binl", LongType,
          nullable = false)()
        val binR = AttributeReference("__graft_binr", LongType,
          nullable = false)()
        val genL = Generate(
          Explode(keys(ls, le, allChannel = chLongRight,
            oppHasLong = hasLongProbe(right, rs, re))),
          Nil, outer = false, qualifier = None, generatorOutput = Seq(binL),
          child = left)
        val genR = Generate(
          Explode(keys(rs, re, allChannel = chLongLeft,
            oppHasLong = hasLongProbe(left, ls, le))),
          Nil, outer = false, qualifier = None, generatorOutput = Seq(binR),
          child = right)

        // fine bins dedup on max(starts); LONG_LEFT (long-left×all-right)
        // is already unique; LONG_RIGHT keeps only short-left pairs so
        // long×long matches exactly once (in LONG_LEFT)
        val ownership = CaseWhen(Seq(
          (EqualTo(binL, Literal(chLongLeft)), Literal(true)),
          (EqualTo(binL, Literal(chLongRight)), Not(isLong(ls, le)))),
          Some(EqualTo(binL, binOf(Greatest(Seq(asLong(ls), asLong(rs)))))))
        val newCond = (conjuncts :+ EqualTo(binL, binR) :+ ownership)
          .reduce(And)
        Some(Project(j.output,
          Join(genL, genR, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
