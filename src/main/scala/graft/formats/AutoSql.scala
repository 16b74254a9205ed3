package graft.formats

import org.apache.spark.sql.types._

/** AutoSql schema parser (SURVEY §2.5 M4).
  *
  * BigBed files embed an AutoSql table declaration describing the tab
  * fields after chrom/chromStart/chromEnd. This parses the published
  * AutoSql grammar into Spark types, matching the reference's field
  * model (`/root/reference/oxbow/src/bbi/model/base/field.rs:25-107`):
  * scalars, fixed `[n]` and variable `[refField]` lists, `char[n]`
  * strings, `enum(...)` (string) and `set(...)` (string list).
  *
  * ```
  * table bedExample
  * "Example declaration"
  * (
  * string chrom;      "Reference sequence"
  * uint   chromStart; "Start position"
  * uint   chromEnd;   "End position"
  * string name;       "Feature name"
  * uint   score;      "0-1000"
  * char[1] strand;    "+ or -"
  * int[blockCount] blockSizes; "Comma separated list"
  * )
  * ```
  */
object AutoSql {

  final case class AsField(name: String, dataType: DataType)
  final case class AsTable(name: String, description: String,
      fields: Seq[AsField])

  private val HeaderName = """(?s)\s*(?:table|simple|object)\s+(\S+)""".r
  private val QuotedRe = """"([^"]*)"""".r
  private val EnumSetRe = """(?s)^(enum|set)\s*\(([^)]*)\)\s+(\w+)$""".r
  private val ScalarRe = """(?s)^([A-Za-z]+)\s*(?:\[\s*([^\]]*)\s*\])?\s+(\w+)$""".r
  // kent-source extended column options (index/primary/auto/unique) —
  // they follow the field name and carry no type information, so they
  // are stripped before the declaration regexes run; without this a
  // BigBed embedding `uint id primary auto;` would fail schema
  // inference entirely
  private val TrailingOpts =
    """(?s)(?:\s+(?:primary|auto|unique|index(?:\s*\[[^\]]*\])?))+\s*$""".r

  def parse(text: String): AsTable = {
    // the field block's '(' must be located OUTSIDE quoted strings — a
    // parenthesis inside the table description is data, not structure
    val open = {
      var i = 0
      var inQuote = false
      var found = -1
      while (found < 0 && i < text.length) {
        val c = text.charAt(i)
        if (c == '"') inQuote = !inQuote
        else if (c == '(' && !inQuote) found = i
        i += 1
      }
      found
    }
    val close = text.lastIndexOf(')')
    require(open >= 0 && close > open, "malformed AutoSql: missing ( ... )")
    val head = text.substring(0, open)
    val name = HeaderName.findFirstMatchIn(head).map(_.group(1)).getOrElse("")
    val description =
      QuotedRe.findFirstMatchIn(head).map(_.group(1)).getOrElse("")
    // declarations end with ';'; the per-field comment FOLLOWS the
    // semicolon, so strip leading quoted strings from each segment.
    // The split is quote-aware for the same reason the '(' search is:
    // a ';' inside a field comment is data, not a declaration break
    val fields = splitOutsideQuotes(text.substring(open + 1, close), ';')
      .map(stripLeadingComment)
      .filter(_.nonEmpty)
      .map(parseField)
    AsTable(name, description, fields)
  }

  private def splitOutsideQuotes(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') { inQuote = !inQuote; cur.append(c) }
      else if (c == sep && !inQuote) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result()
  }

  private def stripLeadingComment(segment: String): String = {
    var s = segment.trim
    while (s.startsWith("\"")) {
      val end = s.indexOf('"', 1)
      if (end < 0) return ""
      s = s.substring(end + 1).trim
    }
    s
  }

  private def parseField(raw: String): AsField = {
    val decl = TrailingOpts.replaceFirstIn(raw, "")
    parseFieldCore(decl)
  }

  private def parseFieldCore(decl: String): AsField = decl match {
    case EnumSetRe(kind, _, name) =>
      // enum → one symbolic value (string); set → comma list of values
      AsField(name,
        if (kind == "enum") StringType else ArrayType(StringType))
    case ScalarRe(tpe, size, name) =>
      val base = scalarType(tpe).getOrElse(
        throw new IllegalArgumentException(s"unknown AutoSql type '$tpe'"))
      val dt =
        if (size == null) base
        // char[n] is a fixed-width string, not a list of chars; any other
        // [n] or [refField] is a comma-separated list in the BED text
        else if (tpe == "char") StringType
        else ArrayType(base)
      AsField(name, dt)
    case other =>
      throw new IllegalArgumentException(s"cannot parse AutoSql field '$other'")
  }

  /** Reference type mapping (`field.rs:25-107`): signed/unsigned small
    * ints widen to int, uint/bigint widen to long (uint covers 2^32-1). */
  private def scalarType(t: String): Option[DataType] = t match {
    case "byte" | "ubyte" | "short" | "ushort" | "int" => Some(IntegerType)
    case "uint" | "bigint" => Some(LongType)
    case "float" => Some(FloatType)
    case "double" => Some(DoubleType)
    case "char" | "string" | "lstring" => Some(StringType)
    case _ => None
  }
}
