package graft.core

/** Genomic coordinate systems and region algebra.
  *
  * Semantics follow the reference's coordinate model
  * (`/root/reference/oxbow/src/coords.rs:16-38`): two interval conventions,
  * one-based fully-closed ("11", the SAM/VCF/GFF convention) and zero-based
  * half-open ("01", the BED/BBI convention). Internally every [[Region]] is
  * normalized to zero-based half-open; converting between systems is a ±1
  * offset on the start coordinate.
  *
  * This is a brand-new Scala implementation — only the observable behavior
  * (accepted notations, round-trip format) matches the reference.
  */
sealed abstract class CoordSystem(val code: String) {
  /** Offset added to an external start coordinate to normalize it to
    * zero-based half-open. */
  def startOffset: Long
}

object CoordSystem {
  /** One-based, fully-closed intervals: `chr1:1-100` covers bases 1..100. */
  case object OneBasedClosed extends CoordSystem("11") { val startOffset = -1L }
  /** Zero-based, half-open intervals: `[0, 100)` covers bases 0..99. */
  case object ZeroBasedHalfOpen extends CoordSystem("01") { val startOffset = 0L }

  def fromCode(code: String): CoordSystem = code match {
    case "11" => OneBasedClosed
    case "01" => ZeroBasedHalfOpen
    case other =>
      throw new IllegalArgumentException(
        s"unknown coordinate system '$other' (expected '11' or '01')")
  }
}

/** A genomic query interval, normalized to zero-based half-open.
  *
  * @param name  reference sequence (chromosome) name
  * @param start 0-based inclusive start
  * @param end   0-based exclusive end; None = to end of sequence
  */
final case class Region(name: String, start: Long, end: Option[Long]) {
  require(start >= 0, s"region start must be >= 0, got $start")
  end.foreach { e =>
    require(e >= start, s"region end ($e) must be >= start ($start)")
  }

  /** True if this region overlaps the zero-based half-open interval
    * [s, e) on the same sequence. */
  def overlaps(chrom: String, s: Long, e: Long): Boolean =
    name == chrom && start < e && end.forall(_ > s)

  /** Length in bases, if bounded. */
  def length: Option[Long] = end.map(_ - start)

  /** Start in the given external coordinate system. */
  def startIn(cs: CoordSystem): Long = start - cs.startOffset

  /** Self-describing bracket form, e.g. `chr1:[10000,20000)`; round-trips
    * through [[Region.parse]]. Matches the reference's Display convention
    * (`coords.rs:279-289`). */
  override def toString: String = end match {
    case Some(e) => s"$name:[$start,$e)"
    case None    => s"$name:[$start,)"
  }
}

object Region {

  private val Ucsc = """(.+?):([0-9,_]+)(?:-([0-9,_]+))?""".r
  private val BracketHalfOpen = """(.+?):\[([0-9,_]+),([0-9,_]*)\)""".r
  private val BracketClosed = """(.+?):\[([0-9,_]+),([0-9,_]+)\]""".r

  private def num(s: String): Long = {
    val digits = s.replaceAll("[,_]", "")
    // separator-only matches like "chr1:," must fail with the
    // documented IllegalArgumentException, not a NumberFormatException
    require(digits.nonEmpty, s"cannot parse region coordinate '$s'")
    digits.toLong
  }

  /** Parse a region string.
    *
    * Accepted notations (reference grammar, `coords.rs:63-243`):
    *  - `"chr1"` — whole sequence
    *  - `"chr1:10,001-20,000"` — UCSC, interpreted in `defaultSystem`
    *    (reference default: one-based closed); `,`/`_` thousands separators
    *  - `"chr1:5000"` — open-ended from the given start
    *  - `"chr1:[10000,20000)"` — explicit zero-based half-open
    *  - `"chr1:[10000,)"` — explicit half-open, unbounded end
    *  - `"chr1:[10001,20000]"` — explicit one-based closed
    */
  def parse(
      s: String,
      defaultSystem: CoordSystem = CoordSystem.OneBasedClosed): Region = {
    val trimmed = s.trim
    trimmed match {
      case BracketHalfOpen(name, a, b) =>
        val start = num(a)
        val end = if (b.isEmpty) None else Some(num(b))
        Region(name, start, end)
      case BracketClosed(name, a, b) =>
        // one-based closed: start-1 → 0-based; end stays (exclusive = closed+1-1)
        Region(name, num(a) - 1, Some(num(b)))
      case Ucsc(name, a, b) =>
        val rawStart = num(a)
        val start = rawStart + defaultSystem.startOffset
        // a closed 1-based end equals the half-open end value, so the
        // end needs no per-system shift
        val end = Option(b).map(num)
        Region(name, start, end)
      case name if name.nonEmpty && !name.contains(':') =>
        Region(name, 0L, None)
      case other =>
        throw new IllegalArgumentException(s"cannot parse region '$other'")
    }
  }

  /** Parse a comma/semicolon-free list of region strings (one per element). */
  def parseAll(specs: Seq[String], cs: CoordSystem): Seq[Region] =
    specs.map(parse(_, cs))
}
