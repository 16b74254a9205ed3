package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{BedField, BedSchema, CoordSystem}
import graft.sources.common.{LineFormat, LineParser, LineTableProvider}

/** DSv2 reader for BED / bedGraph text files (SURVEY §2.1 S10).
  *
  * Options:
  *  - `bed_schema` — `bedN` / `bedN+` / `bedN+M` / `bedgraph` (default `bed3`)
  *  - `fields` — typed extra-field defs `name:type,...` (narrowPeak-style)
  *  - `coords` — output coordinate system `01` (default, native BED) or
  *    `11` (shift start by +1)
  *  - `regions` — `;`-separated region strings to filter (overlap, parsed
  *    with 1-based-closed UCSC default like the reference)
  *  - `maxpartitionbytes` — split size for plain-text files
  *
  * Reference behaviors mirrored: schema grammar
  * (`/root/reference/oxbow/src/bed/model/schema.rs:60-215`), standard
  * field types (`bed/model/field_def.rs:16-32`), itemRgb `"255,0,0"` →
  * [255,0,0] with length-3 enforcement, `.` as null marker, 0-based
  * half-open native coordinates with ±1 start shift on request.
  */
class BedFormat extends LineFormat {
  override def shortName: String = "bed"
  override def commentPrefixes: Seq[String] =
    Seq("#", "track", "browser")
  override def regionColumns: Option[(String, String, String)] =
    Some(("chrom", "start", "end"))

  private def bedSchema(options: Map[String, String]): BedSchema = {
    val custom = options.get("fields")
      .map(BedSchema.parseCustomFields).getOrElse(Nil)
    BedSchema.parse(options.getOrElse("bed_schema", "bed3"), custom)
  }

  override def schema(options: Map[String, String], paths: Seq[Path],
      conf: Configuration): StructType = bedSchema(options).toStructType

  override def newParser(fullSchema: StructType,
      options: Map[String, String]): LineParser = {
    val derived = bedSchema(options)
    // the parser's row shape comes from the bed_schema grammar, not the
    // (possibly user-supplied) fullSchema: a diverging external schema
    // would silently mis-slot every row, so fail loudly instead — names
    // and types must match too, not just the count (a same-length
    // reordered schema mis-slots just as silently)
    val want = derived.toStructType
    val mismatch = fullSchema.fields.zip(want.fields).collectFirst {
      case (got, exp) if got.name != exp.name || got.dataType != exp.dataType =>
        s"field '${got.name}: ${got.dataType.simpleString}' where the " +
          s"grammar dissects '${exp.name}: ${exp.dataType.simpleString}'"
    }
    require(fullSchema.length == want.length && mismatch.isEmpty,
      s"schema has ${fullSchema.length} fields but bed_schema " +
        s"'${options.getOrElse("bed_schema", "bed3")}' dissects " +
        s"${want.length}${mismatch.fold("")(m => s" ($m)")}; describe the " +
        "file with the bed_schema/fields options instead of .schema(...)")
    new BedLineParser(derived, coordSystem(options))
  }
}

class BedLineParser(schema: BedSchema, cs: CoordSystem) extends LineParser {
  private val fields: IndexedSeq[BedField] = schema.fields.toIndexedSeq
  private val nDissected = schema.nDissected
  private val startShift = -cs.startOffset // "11" → +1 on start

  override def parse(line: String): InternalRow = {
    val parts = line.split("\t", -1)
    // whitespace fallback only for files with NO tabs at all: a tabbed
    // line that is merely short (trailing optional fields omitted) must
    // null-pad, not re-split names containing spaces into wrong columns
    val cols =
      if (parts.length > 1) parts
      else line.trim.split("\\s+") // permissive: space-separated BED
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      val raw: String =
        if (schema.restColumn && i == fields.length - 1) {
          if (cols.length > nDissected)
            cols.drop(nDissected).mkString("\t")
          else null
        } else if (i < cols.length && i < nDissected) cols(i)
        else null
      out(i) =
        if (raw == null || raw.isEmpty || (raw == "." && f.name != "name"))
          null
        else convert(f, raw, i)
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def convert(f: BedField, raw: String, idx: Int): Any = f.dataType match {
    case StringType => UTF8String.fromString(raw)
    case LongType =>
      val v = raw.toLong
      // shift only the start coordinate (field index 1) between systems
      if (idx == 1) v + startShift else v
    case IntegerType => raw.toInt
    case FloatType => raw.toFloat
    case DoubleType => raw.toDouble
    case ArrayType(IntegerType, _) => // itemRgb "255,0,0"
      val rgb = raw.split(",").map(_.trim.toInt)
      require(rgb.length == 3 || rgb.length == 1,
        s"itemRgb must have 3 components, got '$raw'")
      ArrayData.toArrayData(
        if (rgb.length == 1) Array(rgb(0), rgb(0), rgb(0)) else rgb)
    case ArrayType(LongType, _) => // blockSizes/blockStarts "1,2,3,"
      ArrayData.toArrayData(
        raw.split(",").filter(_.nonEmpty).map(_.trim.toLong))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported BED field type $other for ${f.name}")
  }
}

/** `spark.read.format("bed")` provider. */
class BedDataSource extends LineTableProvider {
  override def format: BedFormat = new BedFormat
}
