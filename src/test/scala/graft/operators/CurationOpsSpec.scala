package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Specs for the round-9 curation operators: PII redaction, paragraph
  * dedup, temperature sampling, and fixed-point k-means. */
class CurationOpsSpec extends SparkSuite {

  test("redactPii scrubs emails, phones and IPv4s; counts match") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail a.b-c_1%d@sub.example.org then +44-123-4567 at 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "two ips 1.2.3.4 and 255.255.255.255, email x@y.io"))
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.redactPii(col("text")).as("red"),
        TextOps.piiCount(col("text"), TextOps.EmailPattern).as("ne"),
        TextOps.piiCount(col("text"), TextOps.PhonePattern).as("np"),
        TextOps.piiCount(col("text"), TextOps.Ipv4Pattern).as("ni"))
      .orderBy("id").collect()
    assert(out(0).getString(1) ==
      "mail [EMAIL] then [PHONE] at [IP]")
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) ==
      ((1, 1, 1)))
    assert(out(1).getString(1) == "no pii here at all")
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getInt(4)) ==
      ((0, 0, 0)))
    assert(out(2).getString(1) ==
      "two ips [IP] and [IP], email [EMAIL]")
  }

  test("redaction order: a redacted email never leaves a matchable tail") {
    val s = spark
    import s.implicits._
    // the email's numeric local part and dotted domain would feed the
    // IPv4 arm if redaction ran in the wrong order
    val out = Seq("ping 10.1.2.3@ho.st.example.com now")
      .toDF("text").select(TextOps.redactPii(col("text"))).head.getString(0)
    assert(out == "ping [EMAIL] now")
  }

  test("paragraphs chunks the token array; tail keeps the remainder") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d e f g").toDF("text")
      .select(TextOps.paragraphs(col("text"), 3)).head.getSeq[String](0)
    assert(out == Seq("a b c", "d e f", "g"))
  }

  test("chunkDocuments: overlapping windows, tail kept, short doc, " +
      "null text, disjoint at stride == chunk") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Option("a b c d e f g")),
      (2L, Option("x")),        // shorter than one chunk
      (3L, Option.empty[String])) // no rows
      .toDF("doc_id", "text")
    val got = TextOps.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "d e f g", 4L),
      (1L, 2L, "g", 1L),
      (2L, 0L, "x", 1L)))
    // stride == chunk reproduces paragraphs() as rows
    val disjoint = TextOps.chunkDocuments(docs, "doc_id", "text", 3, 3)
      .where(col("doc_id") === 1L).orderBy("chunk_index")
      .collect().map(_.getString(2))
    assert(disjoint.toSeq == Seq("a b c", "d e f", "g"))
    // guardrails: stride 0 / stride > chunk rejected at analysis time
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(docs, "doc_id", "text", 4, 0)
    }
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(docs, "doc_id", "text", 4, 5)
    }
  }

  test("paragraphDedup keeps the earliest occurrence by (id, pos)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq("alpha beta", "gamma delta", "alpha beta")), // self-dup
      (2L, Seq("gamma delta", "unique here")),              // cross-doc dup
      (3L, Seq("alpha beta")))                              // later copy
      .toDF("doc_id", "paras")
    val out = TextOps.paragraphDedup(docs, "doc_id", "paras")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 owns "alpha beta" (pos 0) and "gamma delta"; its second
    // "alpha beta" is a within-doc duplicate
    assert(out(0) == ((1L, 3L, 2L, 1L)))
    assert(out(1) == ((2L, 2L, 1L, 1L)))
    assert(out(2) == ((3L, 1L, 0L, 1L)))
  }

  test("temperatureSample keeps all of the smallest key, down-rates big") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i =>
        (i, if (i < 320) "big" else if (i < 380) "mid" else "small"))
      .toDF("id", "key")
    val kept = TextOps.temperatureSample(df, "key", "id")
    val thr = kept.groupBy("key")
      .agg(max(col("keep_threshold")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // smallest key: rate 1 → threshold = buckets, every row kept
    assert(thr("small")._1 == 1000000L && thr("small")._2 == 20L)
    // alpha=0.5: threshold_k = floor(sqrt(n_min/n_k)·buckets)
    assert(thr("big")._1 ==
      math.floor(math.sqrt(20.0 / 320.0) * 1000000).toLong)
    assert(thr("mid")._1 ==
      math.floor(math.sqrt(20.0 / 60.0) * 1000000).toLong)
    // acceptance is per-id deterministic: a re-run keeps the same rows
    val ids1 = kept.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = TextOps.temperatureSample(df, "key", "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // and the hash filter actually thins the big key below its count
    assert(thr("big")._2 < 320L && thr("big")._2 > 0L)
  }

  test("temperatureSample rejects bad alpha and drops null keys") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "key")
    intercept[IllegalArgumentException] {
      TextOps.temperatureSample(df, "key", "id", alpha = 0.0)
    }
    val kept = TextOps.temperatureSample(df, "key", "id")
    assert(kept.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("kmeansFixedPoint separates two obvious clusters deterministically") {
    val s = spark
    import s.implicits._
    // 2 tight groups in 4-d; ids interleaved so init picks one of each
    val vecs = (0L until 40L).map { i =>
      val c = (i % 2).toFloat
      (i, Array(c + 0.01f * i, c, c, c))
    }.toDF("id", "vec")
    val out = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 2, dim = 4)
      .orderBy("cell_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).sum == 40L)
    assert(out.map(_.getLong(1)).toSeq == Seq(20L, 20L))
    // exact integer arithmetic: a re-run reproduces every column
    val again = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 2, dim = 4)
      .orderBy("cell_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmeansFixedPoint: wrong-dim rows are dropped, empty input is empty") {
    val s = spark
    import s.implicits._
    val mixed = Seq(
      (1L, Array(1f, 2f)), (2L, Array(3f, 4f)), (3L, Array(1f, 2f, 3f)))
      .toDF("id", "vec")
    val out = Similarity.kmeansFixedPoint(mixed, "id", "vec",
      k = 2, iters = 1, dim = 2)
    assert(out.agg(sum("n_vectors")).head.getLong(0) == 2L)
    val empty = Similarity.kmeansFixedPoint(
      mixed.where(lit(false)), "id", "vec", k = 2, iters = 1, dim = 2)
    assert(empty.columns.toSeq ==
      Seq("cell_id", "n_vectors", "sum_dist", "cent_sum"))
    assert(empty.count() == 0L)
  }

  test("kmeansFixedPoint: seeded-sampling init is deterministic and " +
      "converges like lowest-id init") {
    val s = spark
    import s.implicits._
    // ids correlate with content (first 20 ids = cluster 0) — exactly
    // the layout where lowest-id init degenerates to two seeds in the
    // SAME cluster; the seeded sample draws across the corpus
    val vecs = (0L until 40L).map { i =>
      val c = (i / 20).toFloat
      (i, Array(c + 0.001f * i, c, c, c))
    }.toDF("id", "vec")
    val seeded = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 3, dim = 4, initSeed = Some(7L))
      .orderBy("cell_id").collect()
    assert(seeded.map(_.getLong(1)).sum == 40L)
    // pure function of (data, seed): bit-identical on re-run
    val again = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 3, dim = 4, initSeed = Some(7L))
      .orderBy("cell_id").collect()
    assert(seeded.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // with enough iterations the seeded init separates the two obvious
    // clusters (lloyd converges here regardless of which rows seed it)
    val sizes = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 6, dim = 4, initSeed = Some(7L))
      .orderBy("cell_id").collect().map(_.getLong(1)).toSeq
    assert(sizes.sorted == Seq(20L, 20L), s"got $sizes")
    // a different seed is a different (still valid, still total) draw
    val other = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 3, dim = 4, initSeed = Some(8L))
      .agg(sum("n_vectors")).head.getLong(0)
    assert(other == 40L)
  }

  test("kmeansFixedPoint: empty cells keep their centroid") {
    val s = spark
    import s.implicits._
    // both points sit at the same spot; init makes 2 cells but every
    // vector assigns to cell 0 (ties to the lower cell) — cell 1 must
    // survive with its init centroid, not crash or vanish mid-loop
    val vecs = Seq((1L, Array(5f, 5f)), (2L, Array(5f, 5f)))
      .toDF("id", "vec")
    val out = Similarity.kmeansFixedPoint(vecs, "id", "vec",
        k = 2, iters = 3, dim = 2)
      .orderBy("cell_id").collect()
    // only populated cells appear in the output summary
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 0L)
  }

  test("null text: token counts are null and shard offsets stay exact") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"),            // 3 tokens
      (2L, null: String),       // must contribute 0, count null
      (3L, "d e"),              // 2 tokens
      (4L, "f g h i")           // 4 tokens
    ).toDF("id", "text")
    // size(null) = -1 under the default config: un-guarded counts
    // would shift every later offset down and deflate corpus totals
    val counts = docs.select(TextOps.tokenCount(col("text")).as("n"),
      TextOps.bpeTokenCount(col("text")).as("b")).collect()
    assert(counts(1).isNullAt(0) && counts(1).isNullAt(1))
    assert(counts.map(r => if (r.isNullAt(0)) 0 else r.getInt(0)).sum == 9)
    val shards = TextOps.packShards(docs, "id", "text", budget = 5)
      .orderBy("id").collect()
    // exclusive prefix offsets in id order: 0, 3, 3, 5 — the null doc
    // contributes nothing and doc 3 is NOT shifted to offset 2
    assert(shards.map(_.getAs[Long]("tok_offset")).toSeq ==
      Seq(0L, 3L, 3L, 5L))
    assert(shards.map(_.getAs[Long]("shard_id")).toSeq ==
      Seq(0L, 0L, 0L, 1L))
    assert(shards(1).isNullAt(shards(1).fieldIndex("n_tokens")))
  }

  test("null text carries no dedup signal: shingles and paragraphs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, null: String),
      (3L, null: String),
      (4L, "")                  // empty is DISTINCT from null
    ).toDF("id", "text")
    // null text shingles to null (not [""]): two null docs must not
    // minhash identically with each other or with the empty doc
    val sigs = TextOps.minhashSignatures(docs, "id", "text", k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(sigs == Set(1L, 4L), s"null-text docs produced signatures: $sigs")
    // and no near-dup pair can involve a null doc
    val pairs = TextOps.lshCandidatePairs(
      TextOps.minhashSignatures(docs, "id", "text", k = 4), "id",
      k = 4, bandSize = 2).collect()
    assert(pairs.forall(r => r.getLong(0) != 2L && r.getLong(1) != 2L))
    // paragraphs(null) is null (posexplodes to no rows), not ["",""]
    val paras = TextOps.paragraphDedup(
      docs.withColumn("p", TextOps.paragraphs(col("text"), 2)), "id", "p")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_paras")).toMap
    assert(!paras.contains(2L) && !paras.contains(3L),
      s"null-text docs produced paragraphs: $paras")
    assert(paras(1L) == 2L)
  }
}
