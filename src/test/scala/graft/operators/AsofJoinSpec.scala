package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {

  test("asof backward: latest ref at-or-before, row-atomic payload") {
    import spark.implicits._
    val probe = Seq(
      (1, "2024-01-05 10:00:00", "e1"),
      (1, "2024-01-01 00:00:00", "e2"), // equal to order date → inclusive
      (2, "2024-01-03 00:00:00", "e3"), // only later orders → null
      (3, "2024-01-02 00:00:00", "e4")) // no orders for key → null
      .toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq(
      (1, "2024-01-01", 10, Some(100.0)),
      (1, "2024-01-05", 11, Some(110.0)),
      (1, "2024-01-05", 12, None), // tie on date → highest okey wins, and
                                   // its null price must come along (atomic)
      (2, "2024-01-04", 20, Some(200.0)))
      .toDF("ouid", "odate", "okey", "price")
      .withColumn("odate", col("odate").cast("date"))

    val out = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "odate",
      tieBreak = Seq("okey"))
    assert(out.columns.toSeq == Seq("uid", "ts", "eid", "odate", "okey", "price"))
    val got = out.orderBy("eid").collect().map { r =>
      (r.getString(2),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5))
    }.toSeq
    assert(got(0)._1 == "e1" && got(0)._2 == 12 && got(0)._3.isNaN)
    assert(got(1) == (("e2", 10, 100.0)))
    assert(got(2)._2 == -1) // e3: order strictly later
    assert(got(3)._2 == -1) // e4: keyless
    assert(got.size == 4)   // left-outer: every probe row kept
  }

  test("asof backward plan has no per-probe sort or join blow-up") {
    import spark.implicits._
    val probe = Seq((1, "2024-01-02 00:00:00", "e1")).toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, "2024-01-01", 10)).toDF("ouid", "odate", "okey")
      .withColumn("odate", col("odate").cast("date"))
    val plan = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "odate")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"))
    assert(!plan.toLowerCase.contains("cartesianproduct"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }

  test("null-time reference rows are never as-of matches") {
    import spark.implicits._
    // the null-time ref row would sort NULLS FIRST and become the
    // "earliest" match for probes with no genuine predecessor
    val probe = Seq((1, "2024-01-01 00:00:00", "p1"))
      .toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, Option.empty[String], 99),
        (1, Option("2024-06-01 00:00:00"), 7)) // later than the probe
      .toDF("ouid", "ots", "okey")
      .withColumn("ots", col("ots").cast("timestamp"))
    val out = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
      .collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("okey")),
      s"probe with no earlier real ref matched: ${out(0)}")
  }

  test("ref payload named like the probe key is rejected loudly") {
    import spark.implicits._
    val probe = Seq((1, "2024-01-01 00:00:00"))
      .toDF("uid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, "2024-01-01 00:00:00", 5))
      .toDF("ouid", "ots", "uid") // payload column collides with probeKey
      .withColumn("ots", col("ots").cast("timestamp"))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("tolerance nulls too-old matches struct-atomically") {
    import spark.implicits._
    val probe = Seq(
      (1, "2024-01-01 00:10:00", "in_tol"), // 60 s after its match
      (1, "2024-01-01 01:00:00", "too_old"), // 50 min after
      (2, "2024-01-01 00:00:00", "no_match"))
      .toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, "2024-01-01 00:09:00", 7, Option.empty[String]))
      .toDF("ouid", "ots", "okey", "onote")
      .withColumn("ots", col("ots").cast("timestamp"))
    val out = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots",
        tolerance = Some(60L * 1000000L))
      .collect()
      .map(r => (r.getAs[String]("eid"),
        if (r.isNullAt(r.fieldIndex("okey"))) None
        else Some(r.getAs[Int]("okey")),
        // a partially-nulled struct would leave ots set with okey null
        r.isNullAt(r.fieldIndex("ots"))))
      .sortBy(_._1)
      .toSeq
    assert(out == Seq(("in_tol", Some(7), false),
      ("no_match", None, true), ("too_old", None, true)))
    // tolerance-free call over the same data still matches both uid-1
    // probes (the bounded variant must be a pure restriction)
    val free = AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
      .where(col("okey").isNotNull).count()
    assert(free == 2)
    val bad = intercept[IllegalArgumentException] {
      AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots",
        tolerance = Some(-1L))
    }
    assert(bad.getMessage.contains("tolerance"))
  }

  test("forward: earliest at-or-after, max-id tie, tolerance bound") {
    import spark.implicits._
    val probe = Seq(
      (1, "2024-01-01 00:00:00", "equal_tie"), // two refs AT this time
      (1, "2024-01-01 00:00:30", "next_is_0100"),
      (1, "2024-01-01 02:00:00", "nothing_after"),
      (2, "2024-01-01 00:00:00", "only_before"))
      .toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq(
      (1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:00:00", 2),
      (1, "2024-01-01 01:00:00", 3),
      (2, "2023-12-31 23:00:00", 4)) // strictly before probe: no match
      .toDF("ouid", "ots", "okey")
      .withColumn("ots", col("ots").cast("timestamp"))
    def run(tol: Option[Long]) =
      AsofJoin.forward(probe, ref, "uid", "ouid", "ts", "ots",
        tieBreak = Seq("okey"), tolerance = tol)
        .collect()
        .map(r => r.getAs[String]("eid") ->
          (if (r.isNullAt(r.fieldIndex("okey"))) None
           else Some(r.getAs[Int]("okey"))))
        .toMap
    assert(run(None) == Map(
      "equal_tie" -> Some(2), // inclusive; max tieBreak wins
      "next_is_0100" -> Some(3),
      "nothing_after" -> None,
      "only_before" -> None))
    // 30-minute tolerance drops the 59.5-minute-away match only
    assert(run(Some(30L * 60 * 1000000L)) == Map(
      "equal_tie" -> Some(2), "next_is_0100" -> None,
      "nothing_after" -> None, "only_before" -> None))
  }

  test("range twins equal the window variants, incl. one hot key") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    // 90% of BOTH sides on one key — the skew shape the twins exist
    // for — with tied times, null probe times, and keyless refs mixed in
    def key(i: Int) = if (i % 10 < 9) 7 else i % 5
    val probe = Seq.tabulate(800) { i =>
      val ts = if (i % 97 == 0) None
        else Some(new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
      (key(i), ts, i.toLong)
    }.toDF("uid", "ts", "eid")
    val ref = Seq.tabulate(400) { i =>
      (key(i + 3), new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        i.toLong, rnd.nextDouble())
    }.toDF("ouid", "ots", "okey", "price")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("eid").collect().map(_.toSeq.toSeq).toSeq
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(30000L * 1000L))) {
      val win = canon(
        if (fwd) AsofJoin.forward(probe, ref, "uid", "ouid", "ts", "ots",
          tieBreak = Seq("ots", "okey"), tolerance = tol)
        else AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots",
          tieBreak = Seq("ots", "okey"), tolerance = tol))
      for (parts <- Seq(0, 37)) {
        val rng = canon(
          if (fwd) AsofJoin.forwardRange(probe, ref, "uid", "ouid",
            "ts", "ots", tieBreak = Seq("ots", "okey"), tolerance = tol,
            partitions = parts)
          else AsofJoin.backwardRange(probe, ref, "uid", "ouid",
            "ts", "ots", tieBreak = Seq("ots", "okey"), tolerance = tol,
            partitions = parts))
        assert(rng == win, s"fwd=$fwd tol=$tol partitions=$parts")
      }
    }
  }

  test("null-probe-time rows match nothing in BOTH directions") {
    import spark.implicits._
    // desc defaults to NULLS LAST, so an unfixed forward() would sort
    // the null-time probe after the whole reversed timeline and hand
    // it the smallest-time reference row as a spurious match; backward
    // (asc = nulls first) always nulled it — the two directions must
    // agree that a probe without a time matches nothing
    val probe = Seq(
      (1, Option("2024-01-01 00:00:00"), "real"),
      (1, Option.empty[String], "timeless"))
      .toDF("uid", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ref = Seq((1, "2024-01-01 00:00:00", 7))
      .toDF("ouid", "ots", "okey")
      .withColumn("ots", col("ots").cast("timestamp"))
    for (dir <- Seq("backward", "forward")) {
      val out = (if (dir == "backward")
          AsofJoin.backward(probe, ref, "uid", "ouid", "ts", "ots")
        else AsofJoin.forward(probe, ref, "uid", "ouid", "ts", "ots"))
        .collect()
        .map(r => r.getAs[String]("eid") ->
          (if (r.isNullAt(r.fieldIndex("okey"))) None
           else Some(r.getAs[Int]("okey"))))
        .toMap
      assert(out == Map("real" -> Some(7), "timeless" -> None),
        s"direction=$dir: $out")
    }
  }
}
