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
}
