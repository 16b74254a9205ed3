package graft.operators

import graft.SparkSuite

/** Operator-level coverage for [[IntervalJoin.overlapJoin]], including the
  * bounded-explode coarse channels for over-long intervals. */
class IntervalJoinSpec extends SparkSuite {

  test("overlapJoin matches a brute-force cross-join oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val mk = (n: Int, pfx: String) => (0 until n).map { i =>
      val chrom = s"chr${1 + rnd.nextInt(3)}"
      val start = rnd.nextInt(50000).toLong
      val len = 1 + rnd.nextInt(3000)
      (chrom, start, start + len, s"$pfx$i")
    }
    val a = mk(120, "a").toDF("chrom", "start", "end", "a_id")
    val b = mk(150, "b").toDF("chrom2", "start2", "end2", "b_id")

    val got = IntervalJoin.overlapJoin(a, b,
        leftCols = ("chrom", "start", "end"),
        rightCols = ("chrom2", "start2", "end2"), binSize = 1000L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val oracle = a.crossJoin(b)
      .where($"chrom" === $"chrom2" && $"start" < $"end2" &&
        $"start2" < $"end")
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == oracle)
    assert(got.distinct == got) // ownership: each pair exactly once
  }

  test("overlapJoin long intervals via coarse channels, still exact") {
    import spark.implicits._
    // maxBinsPerRow=4 → cap 4000; mix of S/L on both sides incl. nesting
    val a = Seq(
      ("chr1", 100L, 200L, "a1"),
      ("chr1", 0L, 10_000_000L, "a2"),
      ("chr1", 6000L, 6100L, "a3"))
      .toDF("chrom", "start", "end", "a_id")
    val b = Seq(
      ("chr1", 150L, 300L, "b1"),
      ("chr1", 5000L, 9_000_000L, "b2"),
      ("chr1", 20_000_000L, 20_000_100L, "b3"))
      .toDF("chrom2", "start2", "end2", "b_id")
    val got = IntervalJoin.overlapJoin(a, b,
        leftCols = ("chrom", "start", "end"),
        rightCols = ("chrom2", "start2", "end2"),
        binSize = 1000L, maxBinsPerRow = 4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("a1", "b1"), ("a2", "b1"), ("a2", "b2"),
      ("a3", "b2")))
  }

  test("zoomRollup reproduces BBI zoom summary fields") {
    import spark.implicits._
    val iv = Seq(
      ("chr1", 0L, 100L), ("chr1", 50L, 150L), ("chr1", 100100L, 100200L))
      .toDF("chrom", "start", "end")
    val z = IntervalJoin.zoomRollup(iv, resolution = 100000L)
      .orderBy("bin_start").collect()
    assert(z.length == 2)
    assert(z(0).getAs[Long]("n_records") == 2 &&
      z(0).getAs[Long]("bases_covered") == 200L)
    assert(z(1).getAs[Long]("bin_start") == 100000L &&
      z(1).getAs[Long]("bin_end") == 200000L)
  }
}
