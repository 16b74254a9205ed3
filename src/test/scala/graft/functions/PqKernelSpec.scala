package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contract spec for the product-quantization kernels
  * ([[VectorFunctions.PqEncode]] / [[VectorFunctions.PqAdcDist]]).
  * These are NEW primitives with no HOF predecessor, so the spec is a
  * driver-side Scala reference implementation of the documented
  * contract (the same contract the q66 DuckDB oracle mirrors):
  * per-block exact-long argmin with ties to the lower code, ADC as the
  * exact-long sum of coded-centroid squared L2s, null on any
  * undefined input (null element, length mismatch, bad code). */
class PqKernelSpec extends SparkSuite {

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = org.apache.spark.sql.graftshim.ColumnShim.column(e)
  private def exprOf(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftshim.ColumnShim.expression(c)

  // two blocks of 3 dims, 3 resp. 2 sub-centroids; block 1's first two
  // centroids are equidistant from (7,7,7) → tie must break to code 0
  private val books: Seq[Seq[Seq[Long]]] = Seq(
    Seq(Seq(0L, 0L, 0L), Seq(10L, 10L, 10L), Seq(-5L, 0L, 5L)),
    Seq(Seq(6L, 6L, 6L), Seq(8L, 8L, 8L)))

  private def refEncode(v: Seq[Long]): Seq[Int] = {
    var off = 0
    books.map { book =>
      val len = book.head.length
      val slice = v.slice(off, off + len)
      off += len
      book.zipWithIndex.minBy { case (c, i) =>
        (c.zip(slice).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }._2
    }
  }

  private def refAdc(v: Seq[Long], codes: Seq[Int]): Long = {
    var off = 0
    books.zip(codes).map { case (book, code) =>
      val cent = book(code)
      val slice = v.slice(off, off + cent.length)
      off += cent.length
      cent.zip(slice).map { case (a, b) => (b - a) * (b - a) }.sum
    }.sum
  }

  private def pqEnc(c: Column): Column =
    colOf(VectorFunctions.PqEncode(exprOf(c), books))
  private def pqAdc(v: Column, codes: Column): Column =
    colOf(VectorFunctions.PqAdcDist(exprOf(v), exprOf(codes), books))

  test("PqEncode matches the contract reference incl. the tie") {
    val vecs: Seq[Seq[Long]] = Seq(
      Seq(1L, 2L, 3L, 7L, 7L, 7L), // block-1 tie: d(6,6,6)=d(8,8,8)=3
      Seq(9L, 9L, 9L, 6L, 6L, 6L),
      Seq(-4L, 1L, 4L, 100L, -100L, 0L),
      Seq(0L, 0L, 0L, 8L, 8L, 8L))
    val df = spark.createDataFrame(
      vecs.map(v => Tuple1(v))).toDF("v")
    val got = df.select(pqEnc(col("v"))).collect()
      .map(_.getSeq[Int](0).toSeq)
    assert(got.toSeq == vecs.map(refEncode),
      s"encode mismatch: ${got.toSeq} vs ${vecs.map(refEncode)}")
    // the tie row specifically must pick the LOWER code
    assert(got(0)(1) == 0, "block tie must break to the lower code")
  }

  test("PqAdcDist matches the contract reference") {
    val vecs: Seq[Seq[Long]] = Seq(
      Seq(1L, 2L, 3L, 7L, 7L, 7L),
      Seq(9L, 9L, 9L, 6L, 6L, 6L),
      Seq(-4L, 1L, 4L, 100L, -100L, 0L))
    val codes: Seq[Seq[Int]] = Seq(Seq(0, 1), Seq(1, 0), Seq(2, 1))
    val df = spark.createDataFrame(vecs.zip(codes)).toDF("v", "c")
    val got = df.select(pqAdc(col("v"), col("c"))).collect()
      .map(_.getLong(0))
    val want = vecs.zip(codes).map { case (v, c) => refAdc(v, c) }
    assert(got.toSeq == want, s"adc mismatch: ${got.toSeq} vs $want")
  }

  test("undefined inputs yield null, never a partial answer") {
    val rows: Seq[(Seq[java.lang.Long], Seq[Integer])] = Seq(
      (null, Seq[Integer](0, 0)), // null vector
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[Integer](0, 0)), // short vec
      (Seq[java.lang.Long](1L, null, 3L, 4L, 5L, 6L),
        Seq[Integer](0, 0)), // null element
      (Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, 6L), null), // null codes
      (Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, 6L),
        Seq[Integer](0, 9)), // code out of range
      (Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, 6L),
        Seq[Integer](0))) // short code word
    val df = spark.createDataFrame(rows).toDF("v", "c")
    val got = df.select(pqEnc(col("v")).as("e"),
      pqAdc(col("v"), col("c")).as("a")).collect()
    // encode: rows 0-2 undefined; 3-5 have valid vectors → defined
    assert(got.take(3).forall(_.isNullAt(0)),
      "undefined encode inputs must be null")
    assert(got.drop(3).forall(!_.isNullAt(0)),
      "valid vectors must encode despite unrelated code columns")
    // adc: every row above is undefined on at least one side
    assert(got.forall(_.isNullAt(1)), "undefined ADC inputs must be null")
  }

  test("fused PQ training equals per-block trainCentroids exactly") {
    // trainPqBooks runs ONE job per Lloyd round for all blocks; this
    // pins its value-equivalence to m independent per-block
    // trainCentroids loops (same init rows, same argmin tie-breaks,
    // same floor-division updates, same empty-cell inheritance) on the
    // real corpus — the equivalence the q66 oracle's per-block SQL
    // replay relies on
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = graft.operators.Similarity.kmeansBase(
      emb, "vec_id", "embedding", 64, 1000000L)
    val m = 4
    val bl = 16
    val fused = graft.operators.Similarity.trainPqBooks(
      base, m, bl, kSub = 4, iters = 2)
    val perBlock = (0 until m).map { b =>
      graft.operators.Similarity.trainCentroids(
        base.select(col("__id"),
          slice(col("__qv"), b * bl + 1, bl).as("__qv")),
        4, 2, None).map(_._2.toSeq).toSeq
    }
    assert(fused.map(_.map(_.toSeq)) == perBlock.map(_.map(_.toSeq)),
      "fused training diverged from the per-block loops")
  }

  test("VecSubLong: element-wise difference, null on undefined") {
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](5L, -3L, 0L), Seq[java.lang.Long](2L, 2L, 7L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](0L, 0L, 0L)),
      (null, Seq[java.lang.Long](1L)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val got = df.select(colOf(VectorFunctions.VecSubLong(
      exprOf(col("a")), exprOf(col("b"))))).collect()
    assert(got(0).getSeq[Long](0) == Seq(3L, -5L, -7L))
    assert(got.drop(1).forall(_.isNullAt(0)),
      "mismatched/null inputs must yield null")
  }

  test("residual ivfPqTopK with pruning disabled equals brute force") {
    // the residual frame changes ADC scores but never the exact
    // rerank: with nProbe = nCells and a huge adcKeep the output must
    // still be bruteForceTopK exactly
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val approx = graft.operators.Similarity.ivfPqTopK(
      queries, emb, "vec_id", "embedding", k = 3, nCells = 4,
      nProbe = 4, m = 4, kSub = 4, iters = 1, adcKeep = 100000,
      dim = 64, residual = true)
    val exact = graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 3)
    assert(approx.orderBy("query_id", "rank").collect().toSeq ==
      exact.orderBy("query_id", "rank").collect().toSeq,
      "pruning-disabled residual IVF-PQ diverged from brute force")
  }

  test("trained-coarse residual IVFADC with pruning disabled equals " +
      "brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val approx = graft.operators.Similarity.ivfPqTopKTrained(
      queries, emb, "vec_id", "embedding", k = 3, kCells = 4,
      coarseIters = 2, nProbe = 4, m = 4, kSub = 4, iters = 1,
      adcKeep = 100000, dim = 64, residual = true)
    val exact = graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 3)
    assert(approx.orderBy("query_id", "rank").collect().toSeq ==
      exact.orderBy("query_id", "rank").collect().toSeq,
      "pruning-disabled trained IVFADC diverged from brute force")
  }

  test("ivfPqTopK with pruning disabled equals exact brute force") {
    // nProbe = nCells and adcKeep >= corpus size: the ADC stage keeps
    // everything, so the exact rerank must reproduce bruteForceTopK
    // exactly (sim, rank, and tie order) — pinning that PQ/ADC only
    // PRUNES and never alters the scoring tail
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val approx = graft.operators.Similarity.ivfPqTopK(
      queries, emb, "vec_id", "embedding", k = 3, nCells = 4,
      nProbe = 4, m = 4, kSub = 4, iters = 1, adcKeep = 100000,
      dim = 64)
    val exact = graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 3)
    val a = approx.orderBy("query_id", "rank").collect().toSeq
    val e = exact.orderBy("query_id", "rank").collect().toSeq
    assert(a == e, s"pruning-disabled IVF-PQ diverged from brute force")
  }
}
