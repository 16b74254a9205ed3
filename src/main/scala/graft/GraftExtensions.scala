package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GenomicFunctions

/** Session extension registering the genomic expressions in the SQL
  * function registry (SURVEY §7.3), so
  * `spark.sql("SELECT parse_region(r).chrom ...")` works:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Functions: `parse_region(str[, coords])`, `cigar_ref_len(str)`,
  * `cigar_ops(str)`.
  *
  * Also injects [[graft.plans.IntervalJoinRewrite]], the optimizer rule
  * that turns naive chrom-equality + range-overlap joins into binned
  * equi-joins (disable with `spark.graft.intervalJoin.binSize=0`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GenomicFunctions.type].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("parse_region"),
      info("parse_region",
        "parse_region(str[, coords]) - parse a UCSC/bracket region string " +
          "into struct<chrom,start,end> (0-based half-open)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => GenomicFunctions.ParseRegion(c, "11")
        case Seq(c, coords) =>
          // eval()'d at analysis time: only a non-null literal works —
          // guard so a column/null gets an analysis-time error, not an
          // internal Catalyst crash
          if (!coords.foldable) throw new IllegalArgumentException(
            "parse_region coords argument must be a literal ('01'/'11')")
          val v = coords.eval()
          if (v == null) throw new IllegalArgumentException(
            "parse_region coords argument must not be null")
          GenomicFunctions.ParseRegion(c, v.toString)
        case other => throw new IllegalArgumentException(
          s"parse_region takes 1-2 arguments, got ${other.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("cigar_ref_len"),
      info("cigar_ref_len",
        "cigar_ref_len(cigar) - reference bases consumed by a CIGAR string"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => GenomicFunctions.CigarRefLen(c)
        case other => throw new IllegalArgumentException(
          s"cigar_ref_len takes 1 argument, got ${other.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("cigar_ops"),
      info("cigar_ops",
        "cigar_ops(cigar) - CIGAR string as array<struct<op,len>>"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => GenomicFunctions.CigarOps(c)
        case other => throw new IllegalArgumentException(
          s"cigar_ops takes 1 argument, got ${other.size}")
      }))
  }
}
