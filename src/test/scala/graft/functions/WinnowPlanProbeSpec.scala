package graft.functions

import graft.SparkSuite

/** Pins single-evaluation of the winnow expression in the x32/q32
  * aggregate: `winnowStats` projects `fp = winnow(text)` once and
  * aggregates BOTH `size(fp)` and `sum(fp)` over it — if the optimizer
  * folds the projection into the aggregate input expressions, the
  * O(doc) winnow kernel runs TWICE per row (the r14 post-fix A/B
  * measured exactly 2x vs the single-reference r12 shape). */
class WinnowPlanProbeSpec extends SparkSuite {

  test("winnow appears once in the executed aggregate plan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winprobe")
    (0 until 100)
      .map(i => (i.toLong, s"src${i % 3}", s"some text $i " * 20))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val df = graft.SparkEntry.winnowStats(spark, dir.toString,
      fastHash = true)
    val plan = df.queryExecution.executedPlan.toString
    val n = "winnow_fingerprints_fast".r.findAllIn(plan).length
    assert(n == 1, s"winnow evaluated $n times in plan:\n$plan")
  }
}
