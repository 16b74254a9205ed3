package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.common.{LineFormat, LineParser, LineSourceUtil, LineTableProvider}

/** GFF3 / GTF readers (SURVEY §2.1 S11/S12).
  *
  * Nine fixed columns (`seqid source type start end score strand frame`,
  * 1-based closed coordinates, reference `gxf/model/field.rs:9-51`) plus an
  * `attributes` struct whose sub-fields are discovered by sampling the file
  * head — the reference's AttributeScanner pattern
  * (`gxf/model/attribute.rs:166+`, `_core/gxf.py:50-100`):
  *  - GTF attributes are always strings (`key "value";`)
  *  - GFF3 attributes (`key=value`) are strings, or arrays of strings when
  *    any sampled value holds a comma-separated list; values are
  *    percent-decoded
  *
  * Options: `attribute_scan_rows` (default 1024), `attributes`
  * (`name:string,name:array` to skip discovery), `coords` (`11` default —
  * native; `01` shifts start to zero-based), `regions`.
  */
abstract class GxfFormat(val gtfStyle: Boolean) extends LineFormat {
  // UCSC custom-track exports prepend `track`/`browser` header lines to
  // GTF/GFF just as they do to BED — same skip list as BedFormat
  override def commentPrefixes: Seq[String] = Seq("#", "track", "browser")
  override def regionColumns: Option[(String, String, String)] =
    Some(("seqid", "start", "end"))
  override def coordSystem(options: Map[String, String]) =
    graft.core.CoordSystem.fromCode(options.getOrElse("coords", "11"))

  private val fixed = Seq(
    StructField("seqid", StringType), StructField("source", StringType),
    StructField("type", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("score", FloatType),
    StructField("strand", StringType), StructField("frame", IntegerType))

  override def schema(options: Map[String, String], paths: Seq[Path],
      conf: Configuration): StructType = {
    val attrFields: Seq[StructField] = options.get("attributes") match {
      case Some(spec) =>
        spec.split(",").toSeq.filter(_.nonEmpty).map { part =>
          // same name:type grammar as BedSchema.parseCustomFields; parse
          // with indexOf so a malformed spec gets a clear error instead
          // of a MatchError from an irrefutable destructuring
          val colon = part.indexOf(':')
          if (colon <= 0 || colon == part.length - 1 ||
              part.indexOf(':', colon + 1) >= 0)
            throw new IllegalArgumentException(
              s"attributes entries must be name:type, got '$part'")
          val (n, t) = (part.substring(0, colon), part.substring(colon + 1))
          StructField(n.trim, t.trim.toLowerCase match {
            case "string" => StringType
            case "array"  => ArrayType(StringType)
            case other => throw new IllegalArgumentException(
              s"attribute type must be string|array, got '$other'")
          })
        }
      case None =>
        val rows = options.get("attribute_scan_rows").map(_.toInt).getOrElse(1024)
        discoverAttributes(paths, rows)
    }
    StructType(fixed :+
      StructField("attributes", StructType(attrFields.toIndexedSeq)))
  }

  /** Sample the head of the first file(s): collect attribute keys in first-
    * seen order; GFF values containing ',' promote the key to array. */
  private def discoverAttributes(paths: Seq[Path], scanRows: Int): Seq[StructField] = {
    val conf = graft.sources.common.GraftHadoop.conf()
    val keys = mutable.LinkedHashMap.empty[String, Boolean] // name → isArray
    var seen = 0
    paths.iterator.takeWhile(_ => seen < scanRows).foreach { p =>
      val fs = p.getFileSystem(conf)
      val raw = fs.open(p)
      // close the fs handle if the gzip-header read throws before the
      // reader (and its try/finally) exists
      val in =
        try if (LineSourceUtil.isGzip(p)) new GZIPInputStream(raw) else raw
        catch { case e: Throwable => raw.close(); throw e }
      val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      try {
        var line = r.readLine()
        while (line != null && seen < scanRows) {
          if (line.nonEmpty && !line.startsWith("#")) {
            val cols = line.split("\t", -1)
            if (cols.length >= 9) {
              GxfAttributes.parseRaw(cols(8), gtfStyle).foreach { case (k, v) =>
                val isArr = !gtfStyle && v.contains(",")
                keys.get(k) match {
                  case Some(prev) => if (isArr && !prev) keys(k) = true
                  case None => keys(k) = isArr
                }
              }
              seen += 1
            }
          }
          line = r.readLine()
        }
      } finally r.close()
    }
    keys.toSeq.map { case (k, isArr) =>
      StructField(k, if (isArr) ArrayType(StringType) else StringType)
    }
  }

  override def newParser(fullSchema: StructType,
      options: Map[String, String]): LineParser =
    newParser(fullSchema, options, fullSchema)

  /** Projection-aware down to nested fields: column-9 attribute parsing
    * is skipped when the `attributes` struct is not consumed, and the
    * percent-decode/convert limited to the requested keys otherwise. */
  override def newParser(fullSchema: StructType,
      options: Map[String, String], parseNeeded: StructType): LineParser = {
    val attrSchema = fullSchema("attributes").dataType.asInstanceOf[StructType]
    val needed = graft.sources.common.LineSourceUtil
      .nestedStruct(parseNeeded, "attributes").map(_.fieldNames.toSet)
    new GxfParser(attrSchema, gtfStyle, coordSystem(options).startOffset,
      parseAttrs = needed.isDefined, neededAttrs = needed)
  }
}

object GxfAttributes {
  /** Raw key/value pairs from column 9 (no decoding of list values). */
  def parseRaw(s: String, gtfStyle: Boolean): Seq[(String, String)] = {
    if (s.isEmpty || s == ".") return Nil
    if (gtfStyle) {
      // key "value"; key "value";  (values may be unquoted numbers).
      // The split skips ';' INSIDE quoted values — `note "a; b"` is one
      // attribute, not an attribute plus junk
      val segs = {
        val out = Seq.newBuilder[String]
        val cur = new StringBuilder
        var inQ = false
        s.foreach {
          case '"' => inQ = !inQ; cur.append('"')
          case ';' if !inQ => out += cur.toString; cur.clear()
          case c => cur.append(c)
        }
        out += cur.toString
        out.result()
      }
      segs.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        val sp = kv.indexOf(' ')
        if (sp < 0) None
        else {
          val k = kv.substring(0, sp)
          val v = kv.substring(sp + 1).trim.stripPrefix("\"").stripSuffix("\"")
          Some(k -> v)
        }
      }
    } else {
      s.split(";").toIndexedSeq.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) None else Some(kv.substring(0, eq) -> kv.substring(eq + 1))
      }
    }
  }

  /** GFF3 %XX unescaping. NOT URLDecoder: that would throw on a literal
    * '%' that is not a hex escape and turn '+' into a space — neither is
    * GFF3 semantics ('+' is literal; a stray '%' passes through). Works
    * on UTF-8 bytes because escapes encode bytes, not characters. */
  def percentDecode(v: String): String = {
    if (v.indexOf('%') < 0) return v
    val in = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      val c = in(i)
      if (c == '%' && i + 2 < in.length &&
          Character.digit(in(i + 1), 16) >= 0 &&
          Character.digit(in(i + 2), 16) >= 0) {
        out.write(Character.digit(in(i + 1), 16) * 16 +
          Character.digit(in(i + 2), 16))
        i += 3
      } else { out.write(c); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}

class GxfParser(attrSchema: StructType, gtfStyle: Boolean, startOffset: Long,
    parseAttrs: Boolean = true,
    neededAttrs: Option[Set[String]] = None) extends LineParser {
  // slot index limited to the attributes actually consumed
  private val attrIndex: Map[String, Int] = {
    val all = attrSchema.fieldNames.zipWithIndex.toMap
    neededAttrs.fold(all)(keep => all.filter(kv => keep(kv._1)))
  }
  // native GFF/GTF start is 1-based closed; convert to the requested output
  // system: out = native + delta, delta = -1 - outOffset ("11"→0, "01"→-1)
  private val shift = -1L - startOffset

  /** Single pass over column 9, matching the key BEFORE extracting any
    * value substring — un-requested attributes cost nothing beyond the
    * key probe (same semantics as GxfAttributes.parseRaw: last duplicate
    * wins, quoted GTF values unwrapped — with ';' inside quotes kept as
    * data — and GFF3 values percent-decoded; GTF is not a
    * percent-encoded format, so its values pass through verbatim). */
  private def fillAttrs(s: String, attrs: Array[Any]): Unit = {
    if (s.isEmpty || s == ".") return
    val n = s.length
    var start = 0
    while (start < n) {
      var semi = start
      if (gtfStyle) {
        var inQ = false
        while (semi < n && (inQ || s.charAt(semi) != ';')) {
          if (s.charAt(semi) == '"') inQ = !inQ
          semi += 1
        }
      } else {
        semi = s.indexOf(';', start)
        if (semi < 0) semi = n
      }
      var b = start
      while (b < semi && s.charAt(b) == ' ') b += 1
      var e = semi
      while (e > b && s.charAt(e - 1) == ' ') e -= 1
      if (e > b) {
        val sepChar = if (gtfStyle) ' ' else '='
        var sep = b
        while (sep < e && s.charAt(sep) != sepChar) sep += 1
        if (sep > b && sep < e) {
          attrIndex.get(s.substring(b, sep)).foreach { i =>
            var vb = sep + 1
            if (gtfStyle) while (vb < e && s.charAt(vb) == ' ') vb += 1
            var raw = s.substring(vb, e)
            if (gtfStyle)
              raw = raw.stripPrefix("\"").stripSuffix("\"")
            def decode(x: String): String =
              if (gtfStyle) x else GxfAttributes.percentDecode(x)
            attrs(i) = attrSchema(i).dataType match {
              case ArrayType(StringType, _) =>
                ArrayData.toArrayData(raw.split(",").map(x =>
                  UTF8String.fromString(decode(x))))
              case _ =>
                UTF8String.fromString(decode(raw))
            }
          }
        }
      }
      start = semi + 1
    }
  }

  override def parse(line: String): InternalRow = {
    val c = line.split("\t", -1)
    // GFF3 files may end with a ##FASTA section (the directive itself is
    // skipped as a comment): its '>' deflines and sequence lines carry no
    // tabs, while a feature line always has 8+ tab-separated columns —
    // skip tab-less lines so spec-conformant files with embedded FASTA
    // scan cleanly, even when a split partition starts inside the block
    if (c.length == 1) return null
    if (c.length < 8) throw new IllegalArgumentException(
      s"malformed GFF/GTF line (${c.length} cols): '$line'")
    def str(v: String) =
      if (v == "." || v.isEmpty) null else UTF8String.fromString(v)
    // un-projected attributes: null slot (same convention as SAM/BAM/VCF),
    // no per-row array + struct allocation
    val attrsVal: Any = if (!parseAttrs) null else {
      val attrs = new Array[Any](attrSchema.length)
      if (c.length >= 9) fillAttrs(c(8), attrs)
      new GenericInternalRow(attrs)
    }
    new GenericInternalRow(Array[Any](
      str(c(0)), str(c(1)), str(c(2)),
      if (c(3) == "." || c(3).isEmpty) null else c(3).toLong + shift,
      if (c(4) == "." || c(4).isEmpty) null else c(4).toLong,
      if (c(5) == "." || c(5).isEmpty) null else c(5).toFloat,
      str(c(6)),
      if (c(7) == "." || c(7).isEmpty) null else c(7).toInt,
      attrsVal))
  }
}

class GffDataSource extends LineTableProvider {
  override def format: GxfFormat = new GxfFormat(gtfStyle = false) {
    override def shortName: String = "gff"
  }
}

class GtfDataSource extends LineTableProvider {
  override def format: GxfFormat = new GxfFormat(gtfStyle = true) {
    override def shortName: String = "gtf"
  }
}
