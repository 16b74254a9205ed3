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

  test("CellTopK parity with the r13 fold/array_sort HOF tree " +
      "(sticky-null seed, NaN ordering, sim ties)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    // quantizer with a deliberate duplicate direction (cells 10 and 13
    // tie on sim — the fold must keep the LOWER cell id)
    val cents: Seq[(Long, Seq[Double], Double)] = Seq(
      (10L, Seq(1.0, 0.0, 0.0), 1.0),
      (11L, Seq(0.0, 1.0, 0.0), 1.0),
      (12L, Seq(1.0, 1.0, 0.0), math.sqrt(2.0)),
      (13L, Seq(1.0, 0.0, 0.0), 1.0))
    val structType = StructType(Seq(
      StructField("cell_id", LongType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("centn", DoubleType, nullable = false)))
    val centsCol = colOf(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cents.map { case (c, v, n) => org.apache.spark.sql.Row(c, v, n) },
        ArrayType(structType, containsNull = false)))
    def bindC(bound: Column, f: Column => Column): Column =
      element_at(transform(array(bound), f), 1)
    // the r13 HOF formulation, verbatim (cellScores + assignCells)
    def hofScores(vec: Column, n: Column): Column =
      transform(centsCol, c => struct(
        (hofDot(vec, c("cent")) / (n * c("centn"))).as("sim"),
        c("cell_id").as("cell_id")))
    def hofBest(vec: Column, n: Column): Column =
      bindC(hofScores(vec, n), ss =>
        aggregate(ss, element_at(ss, 1), (acc, x) =>
          when(x("sim") > acc("sim") ||
            (x("sim") === acc("sim") && x("cell_id") < acc("cell_id")), x)
            .otherwise(acc)))("cell_id")
    def hofSorted(vec: Column, n: Column, keep: Int): Column =
      transform(slice(array_sort(hofScores(vec, n), (l, r) =>
        when(l("sim") > r("sim"), -1).when(l("sim") < r("sim"), 1)
          .when(l("cell_id") < r("cell_id"), -1)
          .when(l("cell_id") > r("cell_id"), 1).otherwise(0)),
        1, keep), x => x("cell_id"))
    val centMat = cents.map(_._2)
    val centNs = cents.map(_._3)
    def kernelIdx(keep: Int): Column =
      colOf(VectorFunctions.CellTopK(exprOf(col("v")), exprOf(col("n")),
        centMat, centNs, keep))
    def D(x: Double): java.lang.Double = java.lang.Double.valueOf(x)
    val vecs: Seq[(Seq[java.lang.Double], java.lang.Double)] = Seq(
      (Seq[java.lang.Double](1.0, 0.0, 0.0), D(1.0)), // ties 10 vs 13
      (Seq[java.lang.Double](0.1, 0.9, 0.0), D(0.906)),
      (Seq[java.lang.Double](-1.0, -1.0, 0.5), D(1.5)),
      (Seq[java.lang.Double](Double.NaN, 1.0, 0.0), D(1.0)), // NaN sims
      (Seq[java.lang.Double](1.0, null, 0.0), D(1.0)), // sticky null
      (Seq[java.lang.Double](1.0, 2.0), D(2.236)), // wrong length
      (null, D(1.0)), // null vector
      (Seq[java.lang.Double](1.0, 0.0, 0.0),
        null: java.lang.Double)) ++ // null norm
      (0 until 30).map { i =>
        val rnd = new scala.util.Random(i)
        (Seq.fill(3)(rnd.nextDouble() * 2 - 1: java.lang.Double),
          D(rnd.nextDouble() + 0.1))
      }
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = true)),
      StructField("n", DoubleType)))
    val df = spark.createDataFrame(
      vecs.map { case (v, n) => org.apache.spark.sql.Row(v, n) }.asJava,
      schema)
    // keep == 1: kernel index mapped through the SAME literal
    assertSame(df,
      element_at(centsCol, element_at(kernelIdx(1), 1) + 1)("cell_id"),
      hofBest(col("v"), col("n")), "celltopk-keep1")
    // keep > 1 (incl. keep > nCells)
    for (keep <- Seq(2, 3, 9))
      assertSame(df,
        transform(kernelIdx(keep),
          i => element_at(centsCol, i + 1)("cell_id")),
        hofSorted(col("v"), col("n"), keep), s"celltopk-keep$keep")
  }

  test("CellArgMinL2 parity with the r13 fold + array_min HOF tree") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    // duplicate centroid (cells 0 and 3): dist tie must keep cell 0
    val cents: Seq[Seq[Long]] = Seq(
      Seq(0L, 0L), Seq(10L, 0L), Seq(0L, 10L), Seq(0L, 0L))
    val structType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("cent", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val centsCol = colOf(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cents.zipWithIndex.map { case (v, c) =>
          org.apache.spark.sql.Row(c, v) },
        ArrayType(structType, containsNull = false)))
    def bindC(bound: Column, f: Column => Column): Column =
      element_at(transform(array(bound), f), 1)
    def hofL2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, x) => acc + x)
    def hofScores(vec: Column): Column =
      transform(centsCol, c => struct(
        hofL2(vec, c("cent")).as("dist"), c("cell").as("cell")))
    def hofBest(vec: Column): Column =
      bindC(hofScores(vec), ss =>
        aggregate(ss, element_at(ss, 1), (acc, x) =>
          when(x("dist") < acc("dist") ||
            (x("dist") === acc("dist") && x("cell") < acc("cell")), x)
            .otherwise(acc)))("cell")
    def hofMin(vec: Column): Column =
      bindC(hofScores(vec), ss => array_min(transform(ss, x => x("dist"))))
    val kern = colOf(VectorFunctions.CellArgMinL2(exprOf(col("v")), cents))
    val vecs: Seq[Seq[java.lang.Long]] = Seq(
      Seq[java.lang.Long](0L, 0L), // tie with duplicate centroid
      Seq[java.lang.Long](9L, 1L),
      Seq[java.lang.Long](1L, 9L),
      Seq[java.lang.Long](5L, 5L),
      Seq[java.lang.Long](1L, null), // null dists (sticky)
      Seq[java.lang.Long](1L), // wrong length
      null) ++
      (0 until 30).map { i =>
        val rnd = new scala.util.Random(100 + i)
        Seq.fill(2)(rnd.nextLong() % 20: java.lang.Long)
      }
    val schema = StructType(Seq(
      StructField("v", ArrayType(LongType, containsNull = true))))
    val df = spark.createDataFrame(
      vecs.map(v => org.apache.spark.sql.Row(v)).asJava, schema)
    assertSame(df, kern("cell"), hofBest(col("v")), "argmin-cell")
    assertSame(df, kern("dist"), hofMin(col("v")), "argmin-dist")
  }

  test("VecDot/VecNormSq accept integral-element arrays like the HOF") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true)),
      StructField("b", ArrayType(IntegerType, containsNull = true))))
    val rows: Seq[(Seq[java.lang.Long], Seq[Integer])] = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[Integer](4, 5, 6)),
      (Seq[java.lang.Long](1L, null), Seq[Integer](1, 2)),
      (Seq[java.lang.Long](1L), Seq[Integer](1, 2)),
      (null, Seq[Integer](1)))
    val df = spark.createDataFrame(
      rows.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      schema)
    assertSame(df, vecDot(col("a"), col("b")),
      hofDot(col("a"), col("b")), "dot-integral")
    assertSame(df, vecNormSq(col("a")), hofNormSq(col("a")),
      "normsq-long")
    assertSame(df, vecNormSq(col("b")), hofNormSq(col("b")),
      "normsq-int")
  }

  test("SortedBucket matches size(filter(bounds, b => x >= b)) " +
      "incl. null (-> 0) and NaN (-> all)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val bounds = Seq(10.0, 20.0, 30.0, 40.0)
    val hof = size(filter(
      array(bounds.map(lit): _*), b => col("x") >= b))
    val kernel = colOf(VectorFunctions.SortedBucket(
      exprOf(col("x")), bounds))
    val xs: Seq[java.lang.Double] = Seq[java.lang.Double](
      5.0, 10.0, 15.0, 20.0, 39.999, 40.0, 41.0, -1e18, 1e18,
      Double.NaN, null) ++
      (0 until 40).map(i =>
        java.lang.Double.valueOf(new scala.util.Random(i).nextDouble() * 60 - 5))
    val df = spark.createDataFrame(
      xs.map(x => org.apache.spark.sql.Row(x)).asJava,
      StructType(Seq(StructField("x", DoubleType))))
    assertSame(df, kernel, hof, "sorted-bucket")
    // empty bounds: single bucket 0 for every row
    val kernel0 = colOf(VectorFunctions.SortedBucket(
      exprOf(col("x")), Seq.empty))
    val all0 = df.select(kernel0).collect().map(_.getInt(0))
    assert(all0.forall(_ == 0))
  }

  test("AllFinite / QuantizeFloor match the exists/transform HOFs") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val hofFinite = !exists(col("v").cast("array<double>"),
      x => x.isNull || isnan(x) || abs(x) === Double.PositiveInfinity)
    val hofQuant = transform(col("v").cast("array<double>"),
      x => floor(x * 1000000L).cast("long"))
    val kFinite = colOf(VectorFunctions.AllFinite(exprOf(col("v"))))
    val kQuant = colOf(VectorFunctions.QuantizeFloor(
      exprOf(col("v")), 1000000L))
    val vs: Seq[Seq[java.lang.Double]] = Seq(
      Seq[java.lang.Double](0.5, -0.25, 1.0),
      Seq[java.lang.Double](),
      Seq[java.lang.Double](1.0, null),
      Seq[java.lang.Double](Double.NaN, 1.0),
      Seq[java.lang.Double](Double.PositiveInfinity),
      Seq[java.lang.Double](Double.NegativeInfinity),
      null) ++
      (0 until 30).map { i =>
        val rnd = new scala.util.Random(i)
        Seq.fill(4)(rnd.nextDouble() * 4 - 2: java.lang.Double)
      }
    val df = spark.createDataFrame(
      vs.map(v => org.apache.spark.sql.Row(v)).asJava,
      StructType(Seq(StructField("v",
        ArrayType(DoubleType, containsNull = true)))))
    assertSame(df, kFinite, hofFinite, "all-finite")
    // quantize compared only on finite rows (the production contract:
    // the filter runs first; NaN/Inf cast-to-long is ANSI-undefined)
    val fin = df.where(kFinite)
    val rows = fin.select(kQuant.as("k"), hofQuant.as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"quantize: ${r.get(0)} vs ${r.get(1)}")
    }
    // float and INTEGRAL inputs work without the explicit cast (the
    // replaced HOFs cast to array<double>, so any numeric element
    // type was accepted — kmeansFixedPoint on int-quantized vectors
    // must keep working)
    for (t <- Seq("array<float>", "array<int>", "array<long>")) {
      // integral casts must not see NaN/Inf (ANSI cast throws before
      // AllFinite could filter) — the production contract is integral
      // vectors arriving already integral, so build from finite rows
      val src = if (t == "array<float>") df else df.where(hofFinite)
      val vt = src.select(col("v").cast(t).as("v"))
      val rows2 = vt.where(colOf(VectorFunctions.AllFinite(
          exprOf(col("v")))))
        .select(colOf(VectorFunctions.QuantizeFloor(exprOf(col("v")),
          1000000L)).as("k"),
          transform(col("v").cast("array<double>"),
            x => floor(x * 1000000L).cast("long")).as("h"))
        .collect()
      assert(rows2.nonEmpty, s"no finite rows for $t")
      rows2.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"quantize-$t: ${r.get(0)} vs ${r.get(1)}")
      }
    }
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
