package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeFillSpec extends SparkSuite {

  /** The textbook window formulation RangeFill replaces — the oracle. */
  private def windowFill(df: DataFrame, key: String, fillCol: String,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(fillCol, last(col(fillCol), ignoreNulls = true).over(w))
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("k", "pos", "id").collect().map(_.toSeq.toSeq).toSeq

  test("fill equals the window formulation, incl. one hot key across " +
      "many partitions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61)
    // 90% of rows on one key (the skew shape the operator exists for),
    // ~40% null fill values so carries chain across boundaries
    val rows = Seq.tabulate(2000) { i =>
      val k = if (i % 10 < 9) "hot" else s"k${i % 7}"
      val v = if (rnd.nextInt(10) < 4) None else Some(rnd.nextInt(100))
      (k, rnd.nextInt(10000), i.toLong, v)
    }
    val df = rows.toDF("k", "pos", "id", "v")
    val order = Seq(col("pos").asc, col("id").asc)
    val want = canon(windowFill(df, "k", "v", order))
    for (parts <- Seq(1, 5, 40)) {
      val got = canon(RangeFill.fill(df, "k", "v", order, parts))
      assert(got == want, s"partitions=$parts")
    }
  }

  test("all-null runs chain the carry across whole partitions") {
    val s = spark
    import s.implicits._
    // one key, ONE non-null value at the front, then a long null tail:
    // with many tiny partitions the carry must propagate through
    // partitions that contain no non-null value at all
    val rows = (0 until 300).map(i =>
      ("k", i, i.toLong, if (i == 3) Some(42) else Option.empty[Int]))
    val df = rows.toDF("k", "pos", "id", "v")
    val order = Seq(col("pos").asc)
    val got = canon(RangeFill.fill(df, "k", "v", order, 50))
    val want = canon(windowFill(df, "k", "v", order))
    assert(got == want)
    // and the value really did reach the tail
    assert(got.last(3) == 42)
  }

  test("null keys group together; struct payloads; desc ordering") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Option("a"), 1, 1L, Option(10)),
      (Option("a"), 2, 2L, Option.empty[Int]),
      (Option.empty[String], 1, 3L, Option(7)),
      (Option.empty[String], 5, 4L, Option.empty[Int]),
      (Option("b"), 9, 5L, Option.empty[Int]))
    val df0 = rows.toDF("k", "pos", "id", "v0")
      // struct payload: the fill value travels row-atomically
      .withColumn("v", when(col("v0").isNotNull,
        struct(col("v0").as("x"), col("id").as("src"))))
      .drop("v0")
    val order = Seq(col("pos").desc_nulls_first, col("id").asc)
    for (parts <- Seq(1, 3, 8)) {
      val got = canon(RangeFill.fill(df0, "k", "v", order, parts))
      val want = canon(windowFill(df0, "k", "v", order))
      assert(got == want, s"partitions=$parts")
    }
  }

  /** fillBoth's backward oracle: first non-null at-or-after in row
    * order — the window formulation with the frame flipped. */
  private def windowFillBoth(df: DataFrame, key: String, fwd: String,
      bwd: String, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val wF = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(fwd, last(col(fwd), ignoreNulls = true).over(wF))
      .withColumn(bwd, first(col(bwd), ignoreNulls = true).over(wB))
  }

  test("fillBoth equals two window fills, incl. one hot key") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(67)
    // sparse non-null values in BOTH directions so forward and
    // backward carries chain across many boundaries independently
    val rows = Seq.tabulate(2500) { i =>
      val k = if (i % 10 < 9) "hot" else s"k${i % 5}"
      val f = if (rnd.nextInt(10) < 7) None else Some(rnd.nextInt(100))
      val b = if (rnd.nextInt(10) < 7) None else Some(rnd.nextInt(100))
      (k, rnd.nextInt(10000), i.toLong, f, b)
    }
    val df = rows.toDF("k", "pos", "id", "f", "b")
    val order = Seq(col("pos").asc, col("id").asc)
    val want = canon(windowFillBoth(df, "k", "f", "b", order))
    for (parts <- Seq(1, 7, 48)) {
      val got = canon(RangeFill.fillBoth(df, "k", "f", "b", order, parts))
      assert(got == want, s"partitions=$parts")
    }
  }

  test("fillBoth: all-null runs chain BOTH carries across partitions") {
    val s = spark
    import s.implicits._
    // one key; the only forward value sits at the front, the only
    // backward value at the very end — with 50 tiny partitions both
    // carries must chain through partitions holding no value at all,
    // and the pending buffer must hold a key's whole null tail until
    // the partition-end carry flush
    val rows = (0 until 300).map(i => ("k", i, i.toLong,
      if (i == 2) Some(11) else Option.empty[Int],
      if (i == 297) Some(99) else Option.empty[Int]))
    val df = rows.toDF("k", "pos", "id", "f", "b")
    val order = Seq(col("pos").asc)
    val got = canon(RangeFill.fillBoth(df, "k", "f", "b", order, 50))
    assert(got == canon(windowFillBoth(df, "k", "f", "b", order)))
    assert(got.last(3) == 11)   // forward value reached the tail
    assert(got.head(4) == 99)   // backward value reached the head
    // rows before the first forward value stay null; rows after the
    // last backward value stay null
    assert(got.head(3) == null && got.last(4) == null)
  }

  test("fillBoth: key changes cut the backward fill (no later value)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", 1, 1L, Option.empty[Int], Option.empty[Int]),
      ("a", 2, 2L, Option(5), Option.empty[Int]),
      ("b", 1, 3L, Option.empty[Int], Option(7)),
      ("b", 2, 4L, Option.empty[Int], Option.empty[Int]))
    val df = rows.toDF("k", "pos", "id", "f", "b")
    val order = Seq(col("pos").asc)
    for (parts <- Seq(1, 2, 4)) {
      val got = canon(RangeFill.fillBoth(df, "k", "f", "b", order, parts))
      assert(got == canon(windowFillBoth(df, "k", "f", "b", order)),
        s"partitions=$parts")
      // key a's pending null row must NOT take key b's backward value
      assert(got(0)(4) == null, s"partitions=$parts")
      assert(got(2)(4) == 7, s"partitions=$parts")
    }
  }

  /** fillBothK's oracle: the window collect_list formulation — last k
    * non-null fwd values at-or-before (most-recent-first), next k
    * non-null bwd values at-or-after (earliest-first). */
  private def windowFillBothK(df: DataFrame, key: String, fwd: String,
      bwd: String, k: Int,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val wF = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn("lk",
        slice(reverse(collect_list(col(fwd)).over(wF)), 1, k))
      .withColumn("nk", slice(collect_list(col(bwd)).over(wB), 1, k))
  }

  test("fillBothK equals the window collect_list formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(71)
    val rows = Seq.tabulate(1500) { i =>
      val k = if (i % 10 < 8) "hot" else s"k${i % 5}"
      val f = if (rnd.nextInt(10) < 6) None else Some(rnd.nextInt(100))
      val b = if (rnd.nextInt(10) < 6) None else Some(rnd.nextInt(100))
      (k, rnd.nextInt(10000), i.toLong, f, b)
    }
    val df = rows.toDF("k", "pos", "id", "f", "b")
    val order = Seq(col("pos").asc, col("id").asc)
    for (kk <- Seq(1, 3); parts <- Seq(1, 6, 40)) {
      val want = canon(windowFillBothK(df, "k", "f", "b", kk, order)
        .select(col("k"), col("pos"), col("id"), col("lk"), col("nk")))
      val got = canon(
        RangeFill.fillBothK(df, "k", "f", "b", "lk", "nk", kk,
            order, parts)
          .select(col("k"), col("pos"), col("id"), col("lk"), col("nk")))
      assert(got == want, s"k=$kk partitions=$parts")
    }
  }

  test("fillBothK: probes only fill, events pass through with null " +
      "arrays; carries chain deques across partitions") {
    val s = spark
    import s.implicits._
    // one key: values at the front (forward) and back (backward), a
    // probe in the middle of a long value-free gap — with 50 tiny
    // partitions both k-deques must chain across empty partitions
    val rows = (0 until 300).map { i =>
      val f = if (i == 2) Some(20) else if (i == 5) Some(50)
        else if (i == 7) Some(70) else Option.empty[Int]
      val b = if (i == 290) Some(290) else if (i == 295) Some(295)
        else Option.empty[Int]
      ("k", i, i.toLong, f, b, i == 150)
    }
    val df = rows.toDF("k", "pos", "id", "f", "b", "p")
    val got = RangeFill.fillBothK(df, "k", "f", "b", "lk", "nk", 2,
        Seq(col("pos").asc), 50, probeCol = Some("p"))
      .orderBy("pos").collect()
    val probe = got.find(_.getInt(1) == 150).get
    assert(probe.getSeq[Int](6) == Seq(70, 50)) // most-recent-first
    assert(probe.getSeq[Int](7) == Seq(290, 295)) // earliest-first
    // non-probe rows keep null arrays
    assert(got.filter(_.getInt(1) != 150).forall(r =>
      r.isNullAt(6) && r.isNullAt(7)))
  }

  test("fillBothK: null keys group together; struct payloads; " +
      "empty input") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Option("a"), 1, 1L, Option(10), Option.empty[Int]),
      (Option("a"), 2, 2L, Option(11), Option(20)),
      (Option.empty[String], 1, 3L, Option(7), Option.empty[Int]),
      (Option.empty[String], 5, 4L, Option(8), Option(9)),
      (Option("b"), 9, 5L, Option.empty[Int], Option(5)))
      .toDF("k", "pos", "id", "f0", "b0")
      // struct payloads: values must travel row-atomically
      .withColumn("f", when(col("f0").isNotNull,
        struct(col("f0").as("x"), col("id").as("src"))))
      .withColumn("b", when(col("b0").isNotNull,
        struct(col("b0").as("x"), col("id").as("src"))))
      .drop("f0", "b0")
    val order = Seq(col("pos").asc, col("id").asc)
    for (parts <- Seq(1, 3, 8)) {
      val got = RangeFill.fillBothK(rows, "k", "f", "b", "lk", "nk", 2,
          order, parts)
        .orderBy("k", "pos", "id").collect()
        .map(r => (r.getString(0),
          r.getSeq[org.apache.spark.sql.Row](5).map(_.getInt(0)),
          r.getSeq[org.apache.spark.sql.Row](6).map(_.getInt(0))))
      // null-key rows form their own group; key boundaries cut both
      // directions; deques are most-recent-first / earliest-first
      assert(got.toSeq == Seq(
        (null, Seq(7), Seq(9)), (null, Seq(8, 7), Seq(9)),
        ("a", Seq(10), Seq(20)), ("a", Seq(11, 10), Seq(20)),
        ("b", Seq(), Seq(5))), s"partitions=$parts")
    }
    val empty = Seq.empty[(String, Int, Long, Option[Int], Option[Int])]
      .toDF("k", "pos", "id", "f", "b")
    assert(RangeFill.fillBothK(empty, "k", "f", "b", "lk", "nk", 2,
      order).count() == 0)
  }

  test("empty input and more partitions than rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(String, Int, Long, Option[Int])]
      .toDF("k", "pos", "id", "v")
    assert(RangeFill.fill(empty, "k", "v", Seq(col("pos"))).count() == 0)
    val tiny = Seq(("a", 1, 1L, Option(5)), ("a", 2, 2L, Option.empty[Int]))
      .toDF("k", "pos", "id", "v")
    val got = canon(RangeFill.fill(tiny, "k", "v", Seq(col("pos")), 16))
    assert(got.map(_(3)) == Seq(5, 5))
  }
}
