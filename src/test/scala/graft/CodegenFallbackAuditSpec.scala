package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Standing guard for the r14 kernel investment: Spark's higher-order
  * array functions (`aggregate`/`zip_with`/`transform`/`array_sort`
  * lambdas) are `CodegenFallback` — interpreted megamorphic lambda
  * dispatch per element per row, which r14 measured as both a direct
  * cost (the x32 checksum fold) and a code-layout JIT fragility (the
  * q50 bisect landed on a commit the query never executes). Every
  * hot-path HOF was replaced by a codegen'd kernel expression; this
  * spec pins the class of regression by asserting the physical plans
  * of the rewired queries contain NO CodegenFallback expression at
  * all. q32 is deliberately NOT listed: its md5 winnow formulation
  * keeps the HOF shape as the oracle-reproducible reference (the
  * public path is the x32 kernel, covered via winnowStats below). */
class CodegenFallbackAuditSpec extends SparkSuite {

  private val Sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def fallbacks(plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walkExpr(e: Expression): Unit = {
      e match {
        case f: CodegenFallback => out += f.getClass.getSimpleName
        case _ => ()
      }
      e.children.foreach(walkExpr)
    }
    def walkPlan(p: SparkPlan): Unit = {
      p.expressions.foreach(walkExpr)
      p.children.foreach(walkPlan)
      p.subqueries.foreach(walkPlan)
    }
    walkPlan(plan)
    out.toSeq.distinct
  }

  // the queries whose per-row expression trees r14 kernel-ized —
  // minhash/LSH/shingles, banded + IVF ANN, embedding dedup, shard
  // packing, k-means, decontamination, paragraph dedup, plus the
  // fast-path winnow aggregate the bench times
  private val pinned = Seq(
    "q22_fingerprint", "q23_minhash_sig", "q24_neardup_pairs",
    "q26_ngram_jaccard", "q27_cosine_topk", "q28_ann_bucket",
    "q29_embed_neardup", "q33_ann_banded", "q37_dedup_clusters",
    "q40_dedup_star", "q41_ann_ivf", "q45_embed_dedup",
    "q46_repetition", "q48_decontaminate", "q49_shard_pack",
    "q50_leakage_split", "q52_para_dedup", "q53_kmeans",
    "q55_kmeans_seeded", "q63_flat_dedup", "q65_ann_ivf_trained",
    "q66_ann_ivfpq", "q67_sample_stratified", "q68_bm25",
    "q69_rrf_hybrid", "q70_corpus_profile", "q71_knn_label_audit",
    "q72_ann_ivfadc", "q73_ann_ivfadc_trained", "q74_coverage",
    "q75_asof_join", "q76_asof_forward", "q77_closest",
    "q78_complement", "q79_subtract")

  test("rewired query plans contain zero CodegenFallback expressions") {
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for (name <- pinned) {
      val df = SparkEntry.queries(name)(spark, Sf)
      val fb = fallbacks(finalPlan(df))
      if (fb.nonEmpty) bad += s"$name: ${fb.mkString(", ")}"
    }
    assert(bad.isEmpty,
      "CodegenFallback expressions crept back into hot plans:\n" +
        bad.mkString("\n"))
  }

  test("the fast-path winnow aggregate plan is fallback-free") {
    val df = SparkEntry.winnowStats(spark, Sf, fastHash = true)
    val fb = fallbacks(finalPlan(df))
    assert(fb.isEmpty, s"winnowStats(fast) fallbacks: ${fb.mkString(", ")}")
  }
}
