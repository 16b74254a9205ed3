package graft.operators

import org.apache.spark.sql.functions.col

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

  test("overlapJoin(df, df): shared-lineage self join stays exact") {
    import spark.implicits._
    // pairs-within-one-set — the standard genomics use. With attribute
    // -ref join conditions this either threw AMBIGUOUS_SELF_JOIN or
    // degenerated to trivial self-comparisons; the alias-qualified
    // conditions must produce the true overlap pairs.
    val rnd = new scala.util.Random(11)
    val iv = (0 until 80).map { i =>
      val start = rnd.nextInt(20000).toLong
      (s"chr${1 + rnd.nextInt(2)}", start, start + 1 + rnd.nextInt(2000),
        s"v$i")
    }.toDF("chrom", "start", "end", "id")
    // count-based oracle: the self-join output duplicates every column
    // name (both sides are the same frame), so compare pair counts
    // against the brute force rather than selecting by name
    val nGot = IntervalJoin.overlapJoin(iv, iv, binSize = 1000L).count()
    val a = iv.toDF("c1", "s1", "e1", "i1")
    val b = iv.toDF("c2", "s2", "e2", "i2")
    val nOracle = a.crossJoin(b)
      .where($"c1" === $"c2" && $"s1" < $"e2" && $"s2" < $"e1").count()
    assert(nGot == nOracle, s"self join: $nGot vs oracle $nOracle")
  }

  test("overlapJoin preserves caller columns named __bin") {
    import spark.implicits._
    val a = Seq(("chr1", 10L, 100L, 7L)).toDF("chrom", "start", "end", "__bin")
    val b = Seq(("chr1", 50L, 60L, "x")).toDF("c2", "s2", "e2", "id")
    val out = IntervalJoin.overlapJoin(a, b,
      rightCols = ("c2", "s2", "e2"))
    assert(out.columns.contains("__bin"),
      s"caller __bin vanished: ${out.columns.mkString(",")}")
    val r = out.collect()
    assert(r.length == 1 && r(0).getAs[Long]("__bin") == 7L)
  }

  test("zoomRollup rejects a non-positive resolution") {
    import spark.implicits._
    val iv = Seq(("chr1", 0L, 10L)).toDF("chrom", "start", "end")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.zoomRollup(iv, resolution = 0L)
    }
    assert(e.getMessage.contains("resolution"))
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

  test("coordinates near +-2^62 bin exactly (no double-precision loss)") {
    import spark.implicits._
    // doubles near 2^62 are spaced 512 apart: floor(v/binSize) computed
    // through doubles collapses neighbouring intervals into one bin and
    // extreme negatives saturate onto the coarse-channel sentinels.
    // Integer floor-division must keep these exact.
    val hi = 1L << 62
    val lo = -(1L << 62)
    val a = Seq(
      ("chr1", hi, hi + 100L, "a_hi"),
      ("chr1", hi + 200L, hi + 300L, "a_hi2"), // no partner
      ("chr1", lo, lo + 100L, "a_lo"),
      ("chr1", -100L, 50L, "a_zero"))
      .toDF("chrom", "start", "end", "a_id")
    val b = Seq(
      ("chr1", hi + 50L, hi + 150L, "b_hi"),   // overlaps a_hi only
      ("chr1", hi + 301L, hi + 400L, "b_none"),
      ("chr1", lo + 80L, lo + 180L, "b_lo"),   // overlaps a_lo only
      ("chr1", 0L, 10L, "b_zero"))             // overlaps a_zero
      .toDF("chrom2", "start2", "end2", "b_id")
    val got = IntervalJoin.overlapJoin(a, b,
        leftCols = ("chrom", "start", "end"),
        rightCols = ("chrom2", "start2", "end2"), binSize = 64L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("a_hi", "b_hi"), ("a_lo", "b_lo"),
      ("a_zero", "b_zero")))
  }

  test("chromosome-crossing spans (negative start, huge end) classify long") {
    import spark.implicits._
    // end - start overflows Long here (an ANSI error if computed
    // naively) — the row must take the coarse channel and still match
    val a = Seq(
      ("chr1", -1000L, Long.MaxValue, "a_all"),
      ("chr1", 100L, 200L, "a_short"))
      .toDF("chrom", "start", "end", "a_id")
    val b = Seq(
      ("chr1", 150L, 250L, "b1"),
      ("chr1", 5_000_000L, 5_000_100L, "b2"))
      .toDF("chrom2", "start2", "end2", "b_id")
    val got = IntervalJoin.overlapJoin(a, b,
        leftCols = ("chrom", "start", "end"),
        rightCols = ("chrom2", "start2", "end2"), binSize = 1000L,
        maxBinsPerRow = 4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("a_all", "b1"), ("a_all", "b2"), ("a_short", "b1")))
  }

  test("degenerate and negative-coordinate intervals stay exact") {
    import spark.implicits._
    val a = Seq(
      ("chr1", 1000L, 1000L, "a_pt"),   // zero-length on a bin boundary
      ("chr1", 500L, 400L, "a_bad"),    // invalid: must join nothing
      ("chr1", -1500L, -500L, "a_neg"), // fine bins land on -2/-1
      ("chr1", 100L, 200L, "a_ok"))
      .toDF("chrom", "start", "end", "a_id")
    val b = Seq(
      ("chr1", 900L, 1100L, "b_span"),  // strictly spans the point
      ("chr1", 1000L, 1200L, "b_at"),   // starts AT the point: no overlap
      ("chr1", -1000L, -900L, "b_neg"),
      ("chr1", 0L, 9_000_000L, "b_long"), // long row: populates channels
      ("chr1", 150L, 160L, "b_in"))
      .toDF("chrom2", "start2", "end2", "b_id")
    // brute-force oracle: the raw predicate, exactly — inverted rows keep
    // naive-join semantics (a_bad matches b_long, which spans [400,500])
    val oracle = a.crossJoin(b)
      .where(col("chrom") === col("chrom2") &&
        col("start") < col("end2") && col("start2") < col("end"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val got = IntervalJoin.overlapJoin(a, b,
        leftCols = ("chrom", "start", "end"),
        rightCols = ("chrom2", "start2", "end2"),
        binSize = 1000L, maxBinsPerRow = 4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // with the old -1/-2 sentinels, a_neg's fine bins would collide with
    // the coarse channels (forced-true ownership → duplicate pairs)
    assert(got == oracle, s"got $got vs oracle $oracle")
    assert(got.contains(("a_pt", "b_span")) &&
      got.contains(("a_bad", "b_long")))
  }

  test("coarse-channel gating exact under every long-row combination") {
    import spark.implicits._
    def df(rows: Seq[(String, Long, Long, String)], c: String, s: String,
        e: String, id: String) = rows.toDF(c, s, e, id)
    val shortA = Seq(("chr1", 100L, 200L, "a1"), ("chr1", 900L, 1500L, "a2"))
    val longA = shortA :+ ("chr1", 0L, 8_000_000L, "aL")
    val shortB = Seq(("chr1", 150L, 300L, "b1"), ("chr1", 1200L, 1300L, "b2"))
    val longB = shortB :+ ("chr1", 50L, 9_000_000L, "bL")
    // the gating decides per side whether the "all rows" channel ships;
    // every combination must still match the brute-force oracle
    for (aRows <- Seq(shortA, longA); bRows <- Seq(shortB, longB)) {
      val a = df(aRows, "chrom", "start", "end", "a_id")
      val b = df(bRows, "chrom2", "start2", "end2", "b_id")
      val oracle = a.crossJoin(b)
        .where(col("chrom") === col("chrom2") &&
          col("start") < col("end2") && col("start2") < col("end"))
        .select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      val got = IntervalJoin.overlapJoin(a, b,
          leftCols = ("chrom", "start", "end"),
          rightCols = ("chrom2", "start2", "end2"),
          binSize = 1000L, maxBinsPerRow = 4)
        .select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == oracle,
        s"aLong=${aRows.size > 2} bLong=${bRows.size > 2}: $got vs $oracle")
    }
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

  test("zoomRollup clips straddling rows per bin, value-weights sums") {
    import spark.implicits._
    // one long row spanning three bins at resolution 100: BBI-style
    // clipping must credit each bin only its own covered bases —
    // start-bin-only attribution would report bases_covered 250 in bin
    // 0 (2.5x the bin width) and zero coverage in bins 1-2
    val iv = Seq(
      ("chr1", 50L, 300L, 2.0),
      ("chr1", 120L, 140L, 5.0))
      .toDF("chrom", "start", "end", "v")
    val z = IntervalJoin.zoomRollup(iv, resolution = 100L,
        value = Some("v"))
      .orderBy("bin_start").collect()
    assert(z.length == 3, z.mkString(";"))
    // bin 0: [50,100) of the long row
    assert(z(0).getAs[Long]("bases_covered") == 50L)
    assert(z(0).getAs[Double]("sum_val") == 100.0) // 2.0 * 50
    // bin 1: [100,200) of the long row + all of the short one
    assert(z(1).getAs[Long]("n_records") == 2L)
    assert(z(1).getAs[Long]("bases_covered") == 120L)
    assert(z(1).getAs[Double]("min_val") == 2.0 &&
      z(1).getAs[Double]("max_val") == 5.0)
    assert(z(1).getAs[Double]("sum_val") == 2.0 * 100 + 5.0 * 20)
    assert(z(1).getAs[Double]("sum_squares") == 4.0 * 100 + 25.0 * 20)
    // bin 2: [200,300)
    assert(z(2).getAs[Long]("bases_covered") == 100L)
    // degenerate rows cover nothing and are dropped
    val degen = Seq(("chr1", 10L, 10L, 1.0)).toDF("chrom", "start", "end", "v")
    assert(IntervalJoin.zoomRollup(degen, 100L, value = Some("v"))
      .collect().isEmpty)
  }

  test("asof backward: null-key ref rows never match (equi-join parity)") {
    import spark.implicits._
    val probe = Seq((Option(1), "2024-01-02 00:00:00"),
        (Option.empty[Int], "2024-01-02 00:00:00"))
      .toDF("uid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((Option.empty[Int], "2024-01-01 00:00:00", 99),
        (Option(1), "2024-01-01 00:00:00", 7))
      .toDF("ouid", "ots", "okey")
      .withColumn("ots", col("ots").cast("timestamp"))
    val out = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
      .orderBy(col("uid").asc_nulls_last).collect()
    // both probe rows kept (left-outer); the null-key probe matches
    // NOTHING — `key = key` is never true for nulls in the equi-join
    // these window semantics replace — even though a null-key ref row
    // with an earlier time exists and Window.partitionBy groups nulls
    assert(out.length == 2)
    assert(out(0).getInt(out(0).fieldIndex("uid")) == 1 &&
      out(0).getInt(out(0).fieldIndex("okey")) == 7)
    assert(out(1).isNullAt(out(1).fieldIndex("uid")) &&
      out(1).isNullAt(out(1).fieldIndex("okey")),
      s"null-key probe matched a null-key ref: ${out(1)}")
  }

  test("asof backward survives caller columns named like its work columns") {
    import spark.implicits._
    val probe = Seq((1, "2024-01-02 00:00:00", "x"))
      .toDF("uid", "ts", "__asof_t")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, "2024-01-01 00:00:00", 7))
      .toDF("ouid", "ots", "okey")
      .withColumn("ots", col("ots").cast("timestamp"))
    val out = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
      .collect()
    assert(out.length == 1 &&
      out(0).getInt(out(0).fieldIndex("okey")) == 7 &&
      out(0).getString(out(0).fieldIndex("__asof_t")) == "x")
  }

  test("mergeIntervalsRange rejects fractional coordinates loudly") {
    import spark.implicits._
    val frac = Seq(("c", 1.9, 2.5), ("c", 2.6, 3.0))
      .toDF("chrom", "start", "end")
    val e = intercept[IllegalArgumentException] {
      IntervalOps.mergeIntervalsRange(frac)
    }
    assert(e.getMessage.contains("integral"))
  }
}
