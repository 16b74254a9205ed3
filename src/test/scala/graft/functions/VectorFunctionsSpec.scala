package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parity of the codegen'd vector kernels ([[VectorFunctions]]) against
  * the `aggregate`/`zip_with` higher-order formulations they replaced:
  * the HOFs are the SEMANTIC SPEC (they are what the DuckDB oracles
  * mirror), so every kernel must agree bit-for-bit on ordinary data AND
  * on the edge inputs (null arrays, null elements, length mismatches,
  * NaN/Inf, empty arrays). Each case compares whole result columns. */
class VectorFunctionsSpec extends SparkSuite {

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = org.apache.spark.sql.graftshim.ColumnShim.column(e)
  private def exprOf(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftshim.ColumnShim.expression(c)

  // HOF reference formulations (pre-r14 Similarity/SparkEntry code)
  private def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  private def hofNormSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double"))
  private def hofDistSqLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)
  private def hofSumLong(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x)

  private def vecDot(a: Column, b: Column): Column =
    colOf(VectorFunctions.VecDot(exprOf(a), exprOf(b)))
  private def vecNormSq(a: Column): Column =
    colOf(VectorFunctions.VecNormSq(exprOf(a)))
  private def vecDistSqLong(a: Column, b: Column): Column =
    colOf(VectorFunctions.VecDistSqLong(exprOf(a), exprOf(b)))
  private def arrSumLong(a: Column): Column =
    colOf(VectorFunctions.ArraySumLong(exprOf(a)))

  private def assertSame(df: org.apache.spark.sql.DataFrame,
      kernel: Column, hof: Column, label: String): Unit = {
    val rows = df.select(kernel.as("k"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val k = if (r.isNullAt(0)) null else r.get(0)
      val h = if (r.isNullAt(1)) null else r.get(1)
      // bit-level double equality: NaN must equal NaN (primitive ==
      // would fail the row whose VALUES agree exactly)
      val same = (k, h) match {
        case (a: Double, b: Double) =>
          java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b)
        case _ => k == h
      }
      assert(same, s"$label row $i: kernel $k vs HOF $h")
    }
  }

  // float edge corpus: ordinary, empty, null elements, NaN, Inf, null
  // array — plus a deterministic pseudo-random block
  private def floatDf = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(42)
    val rndRows = (0 until 50).map { _ =>
      val n = rnd.nextInt(6)
      (Array.fill(n)(rnd.nextFloat() * 4 - 2: java.lang.Float),
        Array.fill(n)(rnd.nextFloat() * 4 - 2: java.lang.Float))
    }
    val edge: Seq[(Array[java.lang.Float], Array[java.lang.Float])] = Seq(
      (Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](4f, 5f, 6f)),
      (Array[java.lang.Float](), Array[java.lang.Float]()),
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f)), // mismatch
      (Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)),
      (Array[java.lang.Float](Float.NaN, 1f), Array[java.lang.Float](1f, 1f)),
      (Array[java.lang.Float](Float.PositiveInfinity, 1f),
        Array[java.lang.Float](1f, 0f)),
      (null, Array[java.lang.Float](1f)),
      (Array[java.lang.Float](1f), null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true)),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val rows = (edge ++ rndRows).map { case (a, b) =>
      org.apache.spark.sql.Row(
        if (a == null) null else a.toSeq,
        if (b == null) null else b.toSeq)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  test("VecDot matches aggregate(zip_with) on floats incl. edges") {
    assertSame(floatDf, vecDot(col("a"), col("b")),
      hofDot(col("a"), col("b")), "dot-float")
  }

  test("VecDot matches on double/float mixed inputs") {
    val df = floatDf.select(col("a").cast("array<double>").as("ad"),
      col("b").as("b"))
    assertSame(df, vecDot(col("ad"), col("b")),
      hofDot(col("ad"), col("b")), "dot-mixed")
    val df2 = floatDf.select(col("a").cast("array<double>").as("ad"),
      col("b").cast("array<double>").as("bd"))
    assertSame(df2, vecDot(col("ad"), col("bd")),
      hofDot(col("ad"), col("bd")), "dot-double")
  }

  test("VecNormSq matches aggregate fold incl. edges") {
    assertSame(floatDf, vecNormSq(col("a")), hofNormSq(col("a")), "normsq")
    val dd = floatDf.select(col("a").cast("array<double>").as("a"))
    assertSame(dd, vecNormSq(col("a")), hofNormSq(col("a")), "normsq-d")
  }

  test("VecDistSqLong / ArraySumLong match the long folds incl. edges") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))))
    val rnd = new scala.util.Random(7)
    val rndRows = (0 until 50).map { _ =>
      val n = rnd.nextInt(6)
      (Seq.fill(n)(rnd.nextLong() % 100000: java.lang.Long),
        Seq.fill(n)(rnd.nextLong() % 100000: java.lang.Long))
    }
    val edge: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 5L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (null, Seq[java.lang.Long](1L)))
    val rows = (edge ++ rndRows)
      .map { case (a, b) => org.apache.spark.sql.Row(a, b) }
    val df = spark.createDataFrame(rows.asJava, schema)
    assertSame(df, vecDistSqLong(col("a"), col("b")),
      hofDistSqLong(col("a"), col("b")), "distsq-long")
    assertSame(df, arrSumLong(col("a")), hofSumLong(col("a")), "sum-long")
  }

  test("PlaneSignBits matches the when-fold and the transform/zip_with" +
      " band key, incl. null vector -> key 0") {
    import scala.jdk.CollectionConverters._
    val dim = 4
    val bits = 6
    val planes = graft.operators.Similarity.intPlanes(99L, bits, dim)
    // HOF form A (hyperplaneBucket pre-r14): sum of shifted whens
    def hofBucket(vec: Column): Column =
      planes.zipWithIndex.map { case (p, i) =>
        val plane = array(p.map(v => lit(v.toDouble)).toIndexedSeq: _*)
        when(hofDot(vec, plane) > 0.0, 1L << i).otherwise(0L)
      }.reduce(_ + _)
    // HOF form B (bandKeys pre-r14): transform + zip_with + aggregate
    def hofBand(vec: Column): Column = {
      val pl = array(planes
        .map(p => array(p.map(v => lit(v.toDouble)).toIndexedSeq: _*))
        .toIndexedSeq: _*)
      val bitsCol = transform(pl,
        p => when(hofDot(vec, p) > 0.0, 1L).otherwise(0L))
      val weights = array((0 until bits).map(i => lit(1L << i)): _*)
      aggregate(zip_with(bitsCol, weights, (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
    }
    val kernel = colOf(VectorFunctions.PlaneSignBits(exprOf(col("a")),
      planes.map(_.map(_.toDouble).toSeq).toSeq))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val rnd = new scala.util.Random(3)
    val rndRows = (0 until 80).map(_ =>
      Seq.fill(dim)(rnd.nextFloat() * 2 - 1: java.lang.Float))
    val edge: Seq[Seq[java.lang.Float]] = Seq(
      null, // null vector -> key 0 in BOTH HOF forms, not null
      Seq[java.lang.Float](), // wrong length -> all bits 0
      Seq[java.lang.Float](1f, 2f), // wrong length
      Seq[java.lang.Float](1f, null, 1f, 1f), // null element -> bit 0
      Seq[java.lang.Float](Float.NaN, 1f, 1f, 1f))
    val rows = (edge ++ rndRows).map(a => org.apache.spark.sql.Row(a))
    val df = spark.createDataFrame(rows.asJava, schema)
    assertSame(df, kernel, hofBucket(col("a")), "planebits-vs-bucket")
    assertSame(df, kernel, hofBand(col("a")), "planebits-vs-band")
    // and on doubles
    val dd = df.select(col("a").cast("array<double>").as("a"))
    val kernelD = colOf(VectorFunctions.PlaneSignBits(exprOf(col("a")),
      planes.map(_.map(_.toDouble).toSeq).toSeq))
    assertSame(dd, kernelD, hofBucket(col("a")), "planebits-double")
  }

  test("kernel expressions survive a codegen'd projection stage") {
    // a real projection over parquet-free in-memory data with
    // whole-stage codegen on (default): exercises doGenCode, not just
    // interpreted eval
    import spark.implicits._
    val df = (0 until 100)
      .map(i => (i, Array.tabulate(8)(j => (i * 8 + j) / 100.0f)))
      .toDF("id", "v")
    val out = df.select(
      vecDot(col("v"), col("v")).as("d"),
      sqrt(vecNormSq(col("v"))).as("n"),
      colOf(VectorFunctions.PlaneSignBits(exprOf(col("v")),
        graft.operators.Similarity.intPlanes(1L, 4, 8)
          .map(_.map(_.toDouble).toSeq).toSeq)).as("k"))
      .collect()
    assert(out.length == 100)
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1) * r.getDouble(1))
        < 1e-9)
      assert(r.getLong(2) >= 0L && r.getLong(2) < 16L)
    }
  }
}
