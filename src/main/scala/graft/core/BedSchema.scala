package graft.core

import org.apache.spark.sql.types._

/** The `bedN[+[M]]` schema grammar.
  *
  * Grammar and standard-field semantics follow the reference
  * (`/root/reference/oxbow/src/bed/model/schema.rs:60-215`,
  * `bed/model/field_def.rs:16-32`):
  *  - `"bedN"` with 3 ≤ N ≤ 12 — the first N standard BED fields
  *  - `"bedN+"` — N standard fields + one `rest` string column holding the
  *    undissected remainder of the line
  *  - `"bedN+M"` — N standard + M dissected extra columns (`BEDn+i` string
  *    columns unless typed via [[BedSchema.custom]] defs)
  *  - `"bedgraph"` — chrom/start/end + a float `value` column
  *
  * Spark type widening (documented divergences): unsigned ints widen to the
  * next signed type; itemRgb's fixed-size-3 byte list becomes
  * `ArrayType(IntegerType)` with length enforced at parse.
  */
final case class BedField(name: String, dataType: DataType)

final case class BedSchema(
    standard: Seq[BedField],
    extra: Seq[BedField],
    restColumn: Boolean) {

  def fields: Seq[BedField] =
    if (restColumn) standard ++ Seq(BedField("rest", StringType))
    else standard ++ extra

  def toStructType: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = true)))

  /** Number of whitespace-dissected leading columns (everything except a
    * trailing `rest`). */
  def nDissected: Int = standard.size + (if (restColumn) 0 else extra.size)
}

object BedSchema {

  /** The 12 standard BED fields in order. */
  val Standard: Seq[BedField] = Seq(
    BedField("chrom", StringType),
    BedField("start", LongType),
    BedField("end", LongType),
    BedField("name", StringType),
    BedField("score", IntegerType),
    BedField("strand", StringType),
    BedField("thickStart", LongType),
    BedField("thickEnd", LongType),
    BedField("itemRgb", ArrayType(IntegerType)),
    BedField("blockCount", IntegerType),
    BedField("blockSizes", ArrayType(LongType)),
    BedField("blockStarts", ArrayType(LongType)))

  private val BedN = """bed(\d+)(\+(\d*))?""".r

  /** Parse a schema spec.
    *
    * @param spec   `bedN`, `bedN+`, `bedN+M`, or `bedgraph`
    * @param custom typed definitions for the extra (`+M`) fields, e.g.
    *               narrowPeak's `fold_change:double`; untyped extras default
    *               to string columns named `BEDn+i`
    */
  def parse(spec: String, custom: Seq[BedField] = Nil): BedSchema =
    spec.trim.toLowerCase match {
      case "bedgraph" =>
        require(custom.isEmpty,
          s"'bedgraph' declares no extra fields but ${custom.size} " +
            "custom defs given")
        BedSchema(Standard.take(3), Seq(BedField("value", FloatType)),
          restColumn = false)
      case BedN(nStr, plus, mStr) =>
        val n = nStr.toInt
        require(n >= 3 && n <= 12,
          s"bedN requires 3 <= N <= 12, got $n (in '$spec')")
        val std = Standard.take(n)
        if (plus == null) {
          require(custom.isEmpty,
            s"'$spec' declares no extra fields but ${custom.size} custom defs given")
          BedSchema(std, Nil, restColumn = false)
        } else if (mStr == null || mStr.isEmpty) {
          // bedN+ : undissected rest — unless custom defs dissect it
          if (custom.nonEmpty) BedSchema(std, custom, restColumn = false)
          else BedSchema(std, Nil, restColumn = true)
        } else {
          val m = mStr.toInt
          val extras =
            if (custom.nonEmpty) {
              require(custom.size == m,
                s"'$spec' declares $m extra fields but ${custom.size} custom defs given")
              custom
            } else (1 to m).map(i => BedField(s"bed$n+$i", StringType))
          BedSchema(std, extras, restColumn = false)
        }
      case other =>
        throw new IllegalArgumentException(s"cannot parse BED schema '$other'")
    }

  /** Parse a custom-field spec string: `name:type,name:type,...` with types
    * from {string, int, long, float, double}. */
  def parseCustomFields(spec: String): Seq[BedField] =
    spec.split(",").toIndexedSeq.filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(name, tpe) =>
          val dt = tpe.trim.toLowerCase match {
            case "string" => StringType
            case "int"    => IntegerType
            case "long"   => LongType
            case "float"  => FloatType
            case "double" => DoubleType
            case other =>
              throw new IllegalArgumentException(s"unknown field type '$other'")
          }
          BedField(name.trim, dt)
        case _ =>
          throw new IllegalArgumentException(
            s"bad custom field '$part' (expected name:type)")
      }
    }
}
