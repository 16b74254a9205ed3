package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

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
  * Fires only on inner joins whose condition has EXACTLY one
  * attribute-attribute equality (the chrom key) and the two strict
  * range comparisons in opposite directions over integral columns —
  * after the rewrite the join has two equality keys, so the rule never
  * re-fires. Interval semantics are zero-based half-open with
  * non-negative coordinates (genomic convention).
  *
  * Config: `spark.graft.intervalJoin.binSize` (default 1000; 0 disables).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.intervalJoin.binSize"

  private def binSize: Long =
    try SQLConf.get.getConfString(BinSizeKey, "1000").toLong
    catch { case _: NumberFormatException => 1000L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bs = binSize
    if (bs <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, bs).getOrElse(j)
    }
  }

  private def rewrite(j: Join, bs: Long): Option[LogicalPlan] = {
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

    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val lts = conjuncts.collect {
      case lt @ LessThan(a: AttributeReference, b: AttributeReference)
        if integral(a.dataType) && integral(b.dataType) => lt
    }
    // a.start < b.end (left attr < right attr) and b.start < a.end
    val lsRe = lts.find(lt => isLeft(lt.left.asInstanceOf[AttributeReference]) &&
      isRight(lt.right.asInstanceOf[AttributeReference]))
    val rsLe = lts.find(lt => isRight(lt.left.asInstanceOf[AttributeReference]) &&
      isLeft(lt.right.asInstanceOf[AttributeReference]))
    (lsRe, rsLe) match {
      case (Some(o1), Some(o2)) =>
        val ls = o1.left; val le = o2.right
        val rs = o2.left; val re = o1.right

        def asLong(e: Expression): Expression =
          if (e.dataType == LongType) e else Cast(e, LongType)
        def binOf(e: Expression): Expression =
          Cast(Floor(Divide(Cast(e, DoubleType), Literal(bs.toDouble))),
            LongType)
        def bins(s: Expression, e: Expression): Expression =
          new Sequence(binOf(s), binOf(Subtract(asLong(e), Literal(1L))))
            .withTimeZone(conf.sessionLocalTimeZone)

        val binL = AttributeReference("__graft_binl", LongType,
          nullable = false)()
        val binR = AttributeReference("__graft_binr", LongType,
          nullable = false)()
        val genL = Generate(Explode(bins(ls, le)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(binL), child = left)
        val genR = Generate(Explode(bins(rs, re)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(binR), child = right)

        val ownership = EqualTo(binL,
          binOf(Greatest(Seq(asLong(ls), asLong(rs)))))
        val newCond = (conjuncts :+ EqualTo(binL, binR) :+ ownership)
          .reduce(And)
        Some(Project(j.output,
          Join(genL, genR, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
