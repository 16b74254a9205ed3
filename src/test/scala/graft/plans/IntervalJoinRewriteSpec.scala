package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule rewriting naive overlap joins to binned equi-joins. */
class IntervalJoinRewriteSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ivrewrite-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("naive overlap join rewrites to a binned equi-join, same result") {
    withExtSession { spark =>
      import spark.implicits._
      val a = Seq(
        ("chr1", 100L, 200L, "a1"),
        ("chr1", 5000L, 9000L, "a2"), // spans multiple 1000-wide bins
        ("chr2", 10L, 50L, "a3"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(
        ("chr1", 150L, 300L, "b1"),   // overlaps a1
        ("chr1", 8990L, 12000L, "b2"), // overlaps a2 in a shared later bin
        ("chr1", 210L, 220L, "b3"),   // overlaps nothing
        ("chr2", 40L, 60L, "b4"))     // overlaps a3
        .toDF("chrom2", "start2", "end2", "b_id")

      val naive = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))

      // the rule fired: plan carries the Generate'd bin columns
      val optimized = naive.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_binl") &&
        optimized.contains("__graft_binr"), optimized)
      // and the physical join is an equi-join, not BNLJ/cartesian
      val physical = naive.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), physical)

      val got = naive.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("a1", "b1"), ("a2", "b2"), ("a3", "b4")))

      // disabling the rule yields the same rows (semantic equivalence)
      spark.conf.set(IntervalJoinRewrite.BinSizeKey, "0")
      try {
        val plain = a.join(b,
          a("chrom") === b("chrom2") &&
            a("start") < b("end2") && b("start2") < a("end"))
          .select("a_id", "b_id").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
        assert(plain == got)
      } finally spark.conf.set(IntervalJoinRewrite.BinSizeKey, "1000")

      // the GreaterThan spelling of the same predicate fires too
      // (Catalyst never canonicalizes b.end > a.start to a.start < b.end)
      val flipped = a.join(b,
        a("chrom") === b("chrom2") &&
          b("end2") > a("start") && a("end") > b("start2"))
      val flippedPlan = flipped.queryExecution.optimizedPlan.toString
      assert(flippedPlan.contains("__graft_binl"), flippedPlan)
      val gotFlipped = flipped.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(gotFlipped == got)
    }
  }

  test("long intervals take the coarse channels: bounded explode, same result") {
    withExtSession { spark =>
      import spark.implicits._
      // cap = binSize(1000) * maxBinsPerRow(4) = 4000: a2/b2 are "long"
      spark.conf.set(IntervalJoinRewrite.MaxBinsKey, "4")
      try {
        val a = Seq(
          ("chr1", 100L, 200L, "a1"),            // short
          ("chr1", 0L, 10_000_000L, "a2"),       // 10 Mbp — would be 10k bins
          ("chr1", 6000L, 6100L, "a3"))          // short, inside a2
          .toDF("chrom", "start", "end", "a_id")
        val b = Seq(
          ("chr1", 150L, 300L, "b1"),            // short; overlaps a1, a2
          ("chr1", 5000L, 9_000_000L, "b2"),     // long; overlaps a2, a3
          ("chr1", 20_000_000L, 20_000_100L, "b3")) // beyond a2's end
          .toDF("chrom2", "start2", "end2", "b_id")
        val joined = a.join(b,
          a("chrom") === b("chrom2") &&
            a("start") < b("end2") && b("start2") < a("end"))
        assert(joined.queryExecution.optimizedPlan.toString
          .contains("__graft_binl"))
        val got = joined.select("a_id", "b_id").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
        // SS (a1,b1), LS (a2,b1), LL (a2,b2), SL (a3,b2) — each once
        assert(got == Seq(("a1", "b1"), ("a2", "b1"), ("a2", "b2"),
          ("a3", "b2")))
      } finally spark.conf.unset(IntervalJoinRewrite.MaxBinsKey)
    }
  }

  test("open-ended sentinel intervals no longer overflow Sequence") {
    withExtSession { spark =>
      import spark.implicits._
      // end = Long.MaxValue (the "no end" convention) used to generate a
      // Sequence of ~2^53 bins and fail the query at runtime
      val a = Seq(("chr1", 100L, Long.MaxValue, "a1"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(("chr1", 500L, 600L, "b1"))
        .toDF("chrom2", "start2", "end2", "b_id")
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("__graft_binl")) // the rule DID fire — and must be safe
      assert(joined.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a1", "b1")))
    }
  }

  test("degenerate and negative intervals through the rewrite stay exact") {
    withExtSession { spark =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val a = Seq(
        ("chr1", 1000L, 1000L, "a_pt"),   // zero-length on a bin boundary
        ("chr1", 500L, 400L, "a_bad"),    // invalid
        ("chr1", -1500L, -500L, "a_neg"), // fine bins on old sentinels
        ("chr1", 100L, 200L, "a_ok"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(
        ("chr1", 900L, 1100L, "b_span"),
        ("chr1", 1000L, 1200L, "b_at"),
        ("chr1", -1000L, -900L, "b_neg"),
        ("chr1", 0L, 9_000_000_000L, "b_long"))
        .toDF("chrom2", "start2", "end2", "b_id")
      val naive = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      assert(naive.queryExecution.optimizedPlan.toString
        .contains("__graft_binl"))
      val got = naive.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      // brute-force semantics of the ORIGINAL predicate — the rewrite must
      // not change results, inverted rows included
      val oracle = a.crossJoin(b)
        .where(col("chrom") === col("chrom2") &&
          col("start") < col("end2") && col("start2") < col("end"))
        .select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == oracle, s"got $got vs oracle $oracle")
      assert(got.contains(("a_pt", "b_span")) &&
        got.contains(("a_neg", "b_neg")) &&
        got.contains(("a_bad", "b_long")))
    }
  }

  test("non-genomic band joins never fire the rule") {
    withExtSession { spark =>
      import spark.implicits._
      // epoch-micros band join: the exact shape ADVICE flagged — one key
      // equality plus opposite strict inequalities over longs
      val events = Seq((1L, 1_700_000_000_000_000L, 1_700_000_003_600_000L, "w1"))
        .toDF("key", "lo", "hi", "w_id")
      val points = Seq((1L, 1_700_000_001_000_000L, 1_700_000_002_000_000L, "p1"))
        .toDF("key2", "lo2", "hi2", "p_id")
      val band = events.join(points,
        events("key") === points("key2") &&
          events("lo") < points("hi2") && points("lo2") < events("hi"))
      assert(!band.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      assert(band.count() == 1) // plain (slow) join still works
      // opting the column name in via conf turns the rewrite on
      spark.conf.set(IntervalJoinRewrite.KeyColumnsKey,
        IntervalJoinRewrite.DefaultKeyColumns + ",key")
      try {
        val opted = events.join(points,
          events("key") === points("key2") &&
            events("lo") < points("hi2") && points("lo2") < events("hi"))
        assert(opted.queryExecution.optimizedPlan.toString
          .contains("__graft_binl"))
        assert(opted.count() == 1)
      } finally spark.conf.unset(IntervalJoinRewrite.KeyColumnsKey)
    }
  }

  test("all-short workloads ship no coarse-channel copies (runtime probe)") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // a1: 1 fine bin; a2: 2 fine bins; b1: 1 fine bin — no row exceeds
      // the cap, so the probes must suppress every "all rows" coarse copy
      val a = Seq(
        ("chr1", 100L, 200L, "a1"),
        ("chr1", 1500L, 2500L, "a2"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(("chr1", 150L, 250L, "b1"))
        .toDF("chrom2", "start2", "end2", "b_id")
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      val proj = joined.select("a_id", "b_id")
      val opt = proj.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_binl"), opt)
      assert(opt.contains("scalar-subquery"), opt) // probes present
      val got = proj.collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("a1", "b1")))
      // exploded row count == fine bins only (3 left + 1 right); any
      // coarse copy would add one row per input row
      val gens = proj.queryExecution.executedPlan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }
      assert(gens.size == 2, proj.queryExecution.executedPlan.toString)
      val exploded = gens.map(_.metrics("numOutputRows").value).sum
      assert(exploded == 4, s"expected 4 exploded rows, got $exploded")
      // coarseChannels=on restores the unconditional copies: one per input
      // row on top of the 4 fine bins -> 7 exploded rows
      spark.conf.set(IntervalJoinRewrite.CoarseChannelsKey, "on")
      try {
        val on = a.join(b,
          a("chrom") === b("chrom2") &&
            a("start") < b("end2") && b("start2") < a("end"))
          .select("a_id", "b_id")
        assert(!on.queryExecution.optimizedPlan.toString
          .contains("scalar-subquery"))
        val got2 = on.collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
        assert(got2 == got)
        val gens2 = on.queryExecution.executedPlan.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }
        assert(gens2.map(_.metrics("numOutputRows").value).sum == 7)
      } finally spark.conf.unset(IntervalJoinRewrite.CoarseChannelsKey)
    }
  }

  test("rule leaves equi-joins and non-overlap range joins alone") {
    withExtSession { spark =>
      import spark.implicits._
      val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      val b = Seq((1L, 15L), (2L, 5L)).toDF("k2", "v2")
      // two equality keys → not an overlap-join shape
      val eq = a.join(b, a("k") === b("k2") && a("v") === b("v2"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // one-directional range only → not an overlap join
      val range = a.join(b, a("k") === b("k2") && a("v") < b("v2"))
      assert(!range.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      assert(range.count() == 1)
    }
  }

  test("mixed-width int/long overlap joins still fire the rule") {
    withExtSession { spark =>
      import spark.implicits._
      // int starts/ends on one side: the analyzer wraps the comparisons
      // in Cast, which must not stop the rewrite
      val a = Seq(("chr1", 100, 200, "a1"), ("chr1", 5000, 9000, "a2"))
        .toDF("chrom", "start", "end", "a_id") // IntegerType coords
      val b = Seq(("chr1", 150L, 300L, "b1"), ("chr1", 8990L, 12000L, "b2"))
        .toDF("chrom2", "start2", "end2", "b_id") // LongType coords
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("__graft_binl"), joined.queryExecution.optimizedPlan)
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("a1", "b1"), ("a2", "b2")))
    }
  }

  test("user-written NARROWING casts do not fire the rule") {
    withExtSession { spark =>
      import spark.implicits._
      // CAST(longStart AS INT) wraps for values past 2^31: rewriting to
      // bin the full-width attribute would silently change the join's
      // semantics for those rows, so the rule must leave it alone
      val a = Seq(("chr1", 100L, 200L, "a1"),
        ("chr1", (1L << 33) + 100, (1L << 33) + 200, "a2"))
        .toDF("chrom", "start", "end", "a_id") // LongType coords
      val b = Seq(("chr1", 150, 300, "b1"))
        .toDF("chrom2", "start2", "end2", "b_id") // IntegerType coords
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start").cast("int") < b("end2") &&
          b("start2") < a("end").cast("int"))
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("__graft_binl"), joined.queryExecution.optimizedPlan)
      // and the un-rewritten query keeps the cast's ANSI semantics: the
      // out-of-range row ERRORS at execution — a rewrite that binned the
      // full-width attribute would have silently returned rows instead
      val e = intercept[Exception] {
        joined.select("a_id", "b_id").collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("CAST_OVERFLOW")), e)
    }
  }

  test("rewritten chromosome-crossing spans classify long, not overflow") {
    withExtSession { spark =>
      import spark.implicits._
      val a = Seq(
        ("chr1", -1000L, Long.MaxValue, "a_all"),
        ("chr1", 100L, 200L, "a_short"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(("chr1", 150L, 250L, "b1"))
        .toDF("chrom2", "start2", "end2", "b_id")
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("__graft_binl"))
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("a_all", "b1"), ("a_short", "b1")))
    }
  }

  test("rewrite bins coordinates near +-2^62 exactly") {
    withExtSession { spark =>
      import spark.implicits._
      // double-based floor(v/binSize) is 512-coarse at 2^62 and
      // saturates extreme negatives onto the coarse sentinels; the
      // rule's integer floor-division must keep every match exact
      val hi = 1L << 62
      val lo = -(1L << 62)
      val a = Seq(
        ("chr1", hi, hi + 100L, "a_hi"),
        ("chr1", hi + 200L, hi + 300L, "a_hi2"),
        ("chr1", lo, lo + 100L, "a_lo"))
        .toDF("chrom", "start", "end", "a_id")
      val b = Seq(
        ("chr1", hi + 50L, hi + 150L, "b_hi"),
        ("chr1", hi + 301L, hi + 400L, "b_none"),
        ("chr1", lo + 80L, lo + 180L, "b_lo"))
        .toDF("chrom2", "start2", "end2", "b_id")
      val joined = a.join(b,
        a("chrom") === b("chrom2") &&
          a("start") < b("end2") && b("start2") < a("end"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("__graft_binl"))
      val got = joined.select("a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("a_hi", "b_hi"), ("a_lo", "b_lo")))
    }
  }
}
