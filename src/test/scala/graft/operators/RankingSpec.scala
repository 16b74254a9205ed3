package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantics of the retrieval/sampling operators: BM25 against a
  * driver-side reference implementation, RRF fusion contract, and the
  * stratified-sample membership properties the q67 oracle relies on. */
class RankingSpec extends SparkSuite {

  test("bm25 matches a driver-side reference implementation") {
    val docs = Seq(
      (1L, "join scan join filter"),
      (2L, "scan scan scan scan scan scan"),
      (3L, "vector"),
      (4L, "window stream window"),
      (5L, "the quick brown fox")) // no query term at all
    val terms = Seq("join", "scan", "vector")
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = Ranking.bm25(df, "doc_id", "text", terms)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    // reference: same tokenizer, same fixed-order double arithmetic
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val n = toks.size.toDouble
    val avgLen = toks.map(_._2.size).sum.toDouble / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toDouble)
    val want = toks.map { case (id, ws) =>
      val len = ws.size
      var s = 0.0
      terms.zip(dfs).foreach { case (t, dfc) =>
        val tf = ws.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
        s = s + idf * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * len.toDouble / avgLen))
      }
      (id, len, s)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gi, gl, gs), (wi, wl, wsc)) =>
      assert(gi == wi && gl == wl, s"row mismatch: $gi/$gl vs $wi/$wl")
      assert(java.lang.Double.doubleToLongBits(gs) ==
        java.lang.Double.doubleToLongBits(wsc),
        s"doc $gi score bits differ: $gs vs $wsc")
    }
    // the no-term doc still scores (0.0) — it is part of the corpus
    assert(got.find(_._1 == 5L).get._3 == 0.0)
  }

  test("bm25 excludes null-id and null-text docs from the corpus") {
    val rows: Seq[(java.lang.Long, String)] = Seq(
      (1L: java.lang.Long, "join scan"),
      (2L: java.lang.Long, null),
      (null, "join join"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = Ranking.bm25(df, "doc_id", "text", Seq("join")).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L,
      "only the (id, text)-complete doc is in the corpus")
  }

  test("rrfFuse: both-list, one-list and absent-rank contracts") {
    val a = spark.createDataFrame(Seq((10L, 1), (11L, 2), (12L, 3)))
      .toDF("doc_id", "rank")
    val b = spark.createDataFrame(Seq((11L, 1), (13L, 2)))
      .toDF("doc_id", "rank")
    val got = Ranking.rrfFuse(a, b).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val k = 60.0
    assert(got.toSeq == Seq(
      (10L, 1, 0, 1.0 / (k + 1)),
      (11L, 2, 1, 1.0 / (k + 2) + 1.0 / (k + 1)),
      (12L, 3, 0, 1.0 / (k + 3)),
      (13L, 0, 2, 1.0 / (k + 2))))
  }

  test("stratifiedSample: deterministic membership, strata rates, " +
      "null handling") {
    val rows: Seq[(java.lang.Long, String)] =
      (0L until 2000L).map(i => (i: java.lang.Long,
        if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else null)) ++
        Seq((null, "en"))
    val df = spark.createDataFrame(rows).toDF("id", "lang")
    val kept = TextOps.stratifiedSample(df, "id", "lang",
      Seq("en" -> 20, "zh" -> 40), defaultRate = 60)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0),
        r.getLong(1))).toMap
    // Bernoulli at 20/40/60% of ~667 rows each: allow wide tolerance,
    // the POINT is the ordering and the exact determinism below
    assert(byLang("en") > 60 && byLang("en") < 220, s"en=${byLang("en")}")
    assert(byLang("zh") > 180 && byLang("zh") < 350, s"zh=${byLang("zh")}")
    assert(byLang("NULL") > 310 && byLang("NULL") < 480,
      s"null-stratum (default rate) = ${byLang("NULL")}")
    // null id must be dropped, not sampled as a block
    assert(kept.where(col("id").isNull).count() == 0)
    // exact determinism: same seed → identical set; different seed →
    // a different set (overwhelmingly)
    val ids1 = kept.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = TextOps.stratifiedSample(df, "id", "lang",
      Seq("en" -> 20, "zh" -> 40), defaultRate = 60)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "same seed must reproduce the exact set")
    val ids3 = TextOps.stratifiedSample(df, "id", "lang",
      Seq("en" -> 20, "zh" -> 40), defaultRate = 60, seed = 8L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids3, "a different seed must draw a different set")
    // rate 0 keeps nothing from that stratum; rate 100 keeps all
    val edge = TextOps.stratifiedSample(df, "id", "lang",
      Seq("en" -> 0, "zh" -> 100), defaultRate = 0)
    val e = edge.groupBy("lang").count().collect()
      .map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0),
        r.getLong(1))).toMap
    assert(!e.contains("en") && !e.contains("NULL"))
    assert(e("zh") == rows.count(_._2 == "zh"))
  }
}
