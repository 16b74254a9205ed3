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

  test("corpusProfile: exact nearest-rank percentiles vs a reference") {
    // strata with 1, 4, and 10 docs; token counts chosen so p50/p90
    // land on different buckets and duplicate lengths collapse into
    // one histogram bucket
    val docs: Seq[(java.lang.Long, String, String)] = Seq(
      (1L: java.lang.Long, "a", "s1"),
      (2L: java.lang.Long, "a b", "s2"), (3L: java.lang.Long, "a b", "s2"),
      (4L: java.lang.Long, "a b c d", "s2"),
      (5L: java.lang.Long, "a b c d e f", "s2")) ++
      (10L until 20L).map(i => (i: java.lang.Long,
        Seq.fill(i.toInt - 9)("w").mkString(" "), "s3")) ++
      Seq((null, "dropped null id", "s1"),
        (99L: java.lang.Long, null, "s1"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text", "src")
    val prof = TextOps.corpusProfile(df, "doc_id", "text", "src",
      Seq(50, 90)).orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    def ref(lens: Seq[Long], p: Int): Long = {
      val sorted = lens.sorted
      sorted((p * sorted.size + 99) / 100 - 1) // nearest-rank, 1-based
    }
    val s3 = (1L to 10L)
    assert(prof.toSeq == Seq(
      ("s1", 1L, 1L, 1L, 1L, ref(Seq(1L), 50), ref(Seq(1L), 90)),
      ("s2", 4L, 2L + 2L + 4L + 6L, 2L, 6L,
        ref(Seq(2L, 2L, 4L, 6L), 50), ref(Seq(2L, 2L, 4L, 6L), 90)),
      ("s3", 10L, s3.sum, 1L, 10L, ref(s3, 50), ref(s3, 90))),
      s"profile mismatch: ${prof.toSeq}")
  }

  test("knnClassify: self is excluded BEFORE ranking (duplicate edge)") {
    // three EXACT duplicates (ids 0,1,2) + two other points; k=2.
    // Query 2's candidate list must be its two dup mates (sim 1.0,
    // ties to lower id) — if self-exclusion ran AFTER a top-k window,
    // query 2 (self ranked 3rd among the sim-1.0 ties) would keep a
    // non-dup neighbor and mispredict
    val base = Array.fill(4)(0.0f); base(0) = 1.0f
    val far = Array.fill(4)(0.0f); far(3) = 1.0f
    val rows = Seq(
      (0L, base.toSeq, 7), (1L, base.toSeq, 7), (2L, base.toSeq, 7),
      (3L, far.toSeq, 8), (4L, far.map(x => x * 0.5f).toSeq, 8))
    val df = spark.createDataFrame(rows)
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(df, "vec_id", "embedding", "label",
        k = 2, nCells = Some(2), nProbe = 2, dim = Some(4))
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every duplicate predicts 7 from its two mates; 3 and 4 predict 8
    // from each other (their second neighbor is a base point, but one
    // vote each → tie broken to the SMALLER label 7? No: labels vote
    // with counts {8:1, 7:1} → tie → smallest label wins = 7)
    assert(got.toSeq == Seq(
      (0L, 7, 7), (1L, 7, 7), (2L, 7, 7),
      (3L, 8, 7), (4L, 8, 7)), s"got ${got.toSeq}")
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
