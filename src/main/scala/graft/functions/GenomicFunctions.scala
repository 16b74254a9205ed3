package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CoordSystem, Region}

/** Row-level kernels behind the genomic Catalyst expressions, written once
  * and shared by interpreted `nullSafeEval` and generated code alike (a
  * standalone Scala object compiles to static forwarders, so generated
  * Java calls these directly). Keeping the expressions out of
  * `CodegenFallback` keeps the surrounding stage fully codegen'd — no
  * per-row `InternalRow` materialization just to re-enter the interpreter. */
object GenomicCodegen {

  /** Cap on a single CIGAR op count: far above the BAM encoding's
    * 28-bit limit, far below Long wrap even when summed over any
    * realistic op list. */
  final val MaxOpLen: Long = 1L << 40

  /** Reference bases consumed by a CIGAR; -1 encodes SQL null ("*"/empty
    * input — a real CIGAR sums to >= 0). Throws on malformed input. */
  def cigarRefLen(v: UTF8String): Long = {
    val s = v.toString
    if (s == "*" || s.isEmpty) -1L
    else {
      var total = 0L; var n = 0L; var i = 0; var seen = false
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch >= '0' && ch <= '9') {
          n = n * 10 + (ch - '0'); seen = true
          // overflow guard: unchecked accumulation would wrap negative,
          // and a negative total is this function's NULL sentinel — a
          // malformed count must throw, not masquerade as '*'
          if (n > MaxOpLen) throw new IllegalArgumentException(
            s"CIGAR count overflow in '$s'")
        } else {
          if (!seen) throw new IllegalArgumentException(s"bad CIGAR '$s'")
          ch match {
            case 'M' | 'D' | 'N' | '=' | 'X' =>
              total += n
              // the per-op guard bounds each count, but ~8M maximal ops
              // would still wrap the SUM negative — and a negative total
              // is the NULL sentinel, so an overflow would masquerade
              // as '*' instead of throwing
              if (total > MaxOpLen) throw new IllegalArgumentException(
                s"CIGAR reference length overflow in '$s'")
            case 'I' | 'S' | 'H' | 'P'       => ()
            case other =>
              throw new IllegalArgumentException(
                s"bad CIGAR op '$other' in '$s'")
          }
          n = 0; seen = false
        }
        i += 1
      }
      if (seen) throw new IllegalArgumentException(
        s"bad CIGAR '$s' (trailing count)")
      total
    }
  }

  /** CIGAR → array of (op, len) rows; null for "*"/empty. */
  def cigarOps(v: UTF8String): ArrayData = {
    val s = v.toString
    if (s == "*" || s.isEmpty) null
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var n = 0L; var i = 0; var seen = false
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch >= '0' && ch <= '9') {
          n = n * 10 + (ch - '0'); seen = true
          if (n > MaxOpLen) throw new IllegalArgumentException(
            s"CIGAR count overflow in '$s'")
        } else {
          if (!seen || "MIDNSHP=X".indexOf(ch.toInt) < 0)
            throw new IllegalArgumentException(s"bad CIGAR '$s'")
          out += new GenericInternalRow(
            Array[Any](UTF8String.fromString(ch.toString), n))
          n = 0; seen = false
        }
        i += 1
      }
      if (seen) throw new IllegalArgumentException(
        s"bad CIGAR '$s' (trailing count)")
      ArrayData.toArrayData(out.toArray)
    }
  }

  /** Region string → (chrom, start, end) row, zero-based half-open. */
  def parseRegion(v: UTF8String, cs: CoordSystem): InternalRow = {
    val r = Region.parse(v.toString, cs)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.name),
      r.start,
      r.end.map(Long.box).orNull))
  }
}

/** Genomic scalar functions, exposed as Catalyst expressions / Column
  * helpers.
  *
  * These re-expose the format-semantics functions the reference embeds in
  * its record builders (SURVEY §2.7):
  *  - region parsing (`/root/reference/oxbow/src/coords.rs:142-243`)
  *  - CIGAR reference-length semantics
  *    (`/root/reference/oxbow/src/alignment/model/field.rs:448-478`)
  *  - SAM flag bitfield helpers (flags kept raw in the reference,
  *    `alignment/model/field.rs:234-236`)
  */
object GenomicFunctions {

  // ---------------------------------------------------------------- regions

  /** Catalyst expression: parse a region string (UCSC or bracket notation)
    * into `struct<chrom: string, start: bigint, end: bigint>`, normalized to
    * zero-based half-open. `end` is null for open-ended regions.
    */
  case class ParseRegion(child: Expression, coords: String)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    // eager: an invalid coords code must fail at expression
    // construction (a well-located analysis-time error), not from the
    // first task that evaluates the lazy val mid-query
    private val cs = CoordSystem.fromCode(coords)
    override def dataType: DataType = StructType(Seq(
      StructField("chrom", StringType, nullable = true),
      StructField("start", LongType, nullable = true),
      StructField("end", LongType, nullable = true)))
    override def nullSafeEval(v: Any): Any =
      GenomicCodegen.parseRegion(v.asInstanceOf[UTF8String], cs)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val csRef = ctx.addReferenceObj("coordSys", cs,
        classOf[CoordSystem].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GenomicCodegen.parseRegion($c, $csRef);")
    }
    override def prettyName: String = "parse_region"
    override protected def withNewChildInternal(c: Expression): ParseRegion =
      copy(child = c)
  }

  /** Parse a region string column. `coords` is the coordinate system UCSC
    * notation is interpreted in: "11" one-based closed (default, SAM/VCF
    * convention) or "01" zero-based half-open (BED convention). */
  def parse_region(c: Column, coords: String = "11"): Column =
    Column(ParseRegion(expression(c), coords))

  /** Zero-based half-open interval overlap predicate between
    * (chromA, startA, endA) and (chromB, startB, endB). A null end means
    * OPEN-ENDED (unbounded right edge) — the contract [[parse_region]]
    * emits for `"chr1"` / `"chr1:5000"` and `graft.core.Region.overlaps`
    * implements — so whole-chromosome regions overlap everything on
    * their chromosome instead of silently matching nothing under SQL
    * three-valued logic. */
  def regions_overlap(chromA: Column, startA: Column, endA: Column,
                      chromB: Column, startB: Column, endB: Column): Column =
    chromA === chromB &&
      (endB.isNull || startA < endB) &&
      (endA.isNull || startB < endA)

  // ------------------------------------------------------------------ cigar

  /** Number of reference bases consumed by a CIGAR string: sum of lengths of
    * M/D/N/=/X operations (I/S/H/P consume none). Null for "*" or null. */
  case class CigarRefLen(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    // '*'/empty evaluate to null even from a non-nullable child; without
    // this the optimizer folds IS NULL checks on the result to false
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = GenomicCodegen.cigarRefLen(v.asInstanceOf[UTF8String])
      if (r < 0) null else r
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.GenomicCodegen.cigarRefLen($c);
        if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
      """)
    override def prettyName: String = "cigar_ref_len"
    override protected def withNewChildInternal(c: Expression): CigarRefLen =
      copy(child = c)
  }

  def cigar_ref_len(c: Column): Column = Column(CigarRefLen(expression(c)))

  /** CIGAR string → array of (op, len) structs. */
  case class CigarOps(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("len", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true // '*'/empty → null (see CigarRefLen)
    override def nullSafeEval(v: Any): Any =
      GenomicCodegen.cigarOps(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.GenomicCodegen.cigarOps($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override def prettyName: String = "cigar_ops"
    override protected def withNewChildInternal(c: Expression): CigarOps =
      copy(child = c)
  }

  def cigar_ops(c: Column): Column = Column(CigarOps(expression(c)))

  // ------------------------------------------------------------------ flags

  /** SAM flag bit helpers (SAMv1 spec §1.4.2). Pure bitwise-and columns so
    * they stay inside whole-stage codegen. */
  def flag_is_paired(flag: Column): Column        = (flag.bitwiseAND(lit(0x1))) =!= 0
  def flag_is_proper_pair(flag: Column): Column   = (flag.bitwiseAND(lit(0x2))) =!= 0
  def flag_is_unmapped(flag: Column): Column      = (flag.bitwiseAND(lit(0x4))) =!= 0
  def flag_mate_unmapped(flag: Column): Column    = (flag.bitwiseAND(lit(0x8))) =!= 0
  def flag_is_reverse(flag: Column): Column       = (flag.bitwiseAND(lit(0x10))) =!= 0
  def flag_is_secondary(flag: Column): Column     = (flag.bitwiseAND(lit(0x100))) =!= 0
  def flag_is_qc_fail(flag: Column): Column       = (flag.bitwiseAND(lit(0x200))) =!= 0
  def flag_is_duplicate(flag: Column): Column     = (flag.bitwiseAND(lit(0x400))) =!= 0
  def flag_is_supplementary(flag: Column): Column = (flag.bitwiseAND(lit(0x800))) =!= 0

  // ----------------------------------------------------------------- coords

  /** Shift a start coordinate between coordinate systems ("01" ↔ "11"):
    * to one-based adds 1; to zero-based subtracts 1. */
  def coord_shift(start: Column, from: String, to: String): Column =
    (CoordSystem.fromCode(from), CoordSystem.fromCode(to)) match {
      case (a, b) if a == b => start
      case (CoordSystem.ZeroBasedHalfOpen, CoordSystem.OneBasedClosed) => start + 1
      case _ => start - 1
    }

  private def expression(c: Column): Expression =
    org.apache.spark.sql.graftshim.ColumnShim.expression(c)
  private def Column(e: Expression): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(e)
}
