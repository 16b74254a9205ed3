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
  *     probes assume the inputs are deterministic (same assumption as
  *     the operator — see `IntervalJoin.overlapJoin`'s doc).
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
    if (bs <= 0 || maxBins <= 0) plan
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
    // a.start < b.end (left attr < right attr) and b.start < a.end
    val lsRe = lts.find { case (a, b) => isLeft(a) && isRight(b) }
    val rsLe = lts.find { case (a, b) => isRight(a) && isLeft(b) }
    (lsRe, rsLe) match {
      case (Some(o1), Some(o2)) =>
        val ls = o1._1; val le = o2._2
        val rs = o2._1; val re = o1._2

        val chLongLeft = graft.operators.IntervalJoin.LongLeftChannel
        val chLongRight = graft.operators.IntervalJoin.LongRightChannel
        def asLong(e: Expression): Expression =
          if (e.dataType == LongType) e else Cast(e, LongType)
        // exact integer floor division: (v - pmod(v, bs)) is a multiple of
        // bs, so the truncating IntegralDivide equals floor. Double-based
        // Floor(v/bs) loses bin precision past 2^53 and saturates extreme
        // negatives onto the sentinel values; integer arithmetic keeps the
        // sentinels unreachable for every coordinate above
        // Long.MinValue + bs.
        def binOf(e: Expression): Expression = {
          val v = asLong(e)
          new IntegralDivide(
            Subtract(v, new Pmod(v, Literal(bs))), Literal(bs))
        }
        val capLen = Literal(bs * maxBins)
        // e - s overflows Long for spans crossing huge magnitudes
        // (negative start, end near Long.MaxValue — both explicitly
        // supported); TRY-mode subtraction yields null there, and a
        // null length with e > s can only mean "astronomically long"
        def isLong(s: Expression, e: Expression): Expression = {
          val diff = Subtract(asLong(e), asLong(s), EvalMode.TRY)
          Coalesce(Seq(GreaterThan(diff, capLen),
            GreaterThan(asLong(e), asLong(s))))
        }
        def isShort(s: Expression, e: Expression): Expression =
          Not(isLong(s, e))

        // runtime long-row existence probe of one side: an uncorrelated
        // scalar subquery the physical planner executes once and inlines
        val coarseMode =
          SQLConf.get.getConfString(CoarseChannelsKey, "auto")
        def hasLongProbe(side: LogicalPlan, s: Expression,
            e: Expression): Expression =
          if (coarseMode == "on") Literal(true)
          else ScalarSubquery(Aggregate(Nil, Seq(Alias(
            Coalesce(Seq(
              GreaterThanOrEqual(
                Max(If(isLong(s, e), Literal(1L), Literal(0L)))
                  .toAggregateExpression(),
                Literal(1L)),
              Literal(false))), "__graft_has_long")()), side))

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
            (Not(isShort(s, e)),
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
          (EqualTo(binL, Literal(chLongRight)), isShort(ls, le))),
          Some(EqualTo(binL, binOf(Greatest(Seq(asLong(ls), asLong(rs)))))))
        val newCond = (conjuncts :+ EqualTo(binL, binR) :+ ownership)
          .reduce(And)
        Some(Project(j.output,
          Join(genL, genR, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
