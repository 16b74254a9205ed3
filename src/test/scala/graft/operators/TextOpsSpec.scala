package graft.operators

import graft.SparkSuite

class TextOpsSpec extends SparkSuite {

  test("fastHash variant: valid, distinct from md5, dedup-equivalent") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark execution plans"))
      .toDF("doc_id", "text")
    // minhash: identical docs agree on EVERY signature under both hash
    // families; the families themselves produce different values
    for (fast <- Seq(false, true)) {
      val sig = TextOps.minhashSignatures(docs, "doc_id", "text", 4,
        fastHash = fast).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(sig(1L) == sig(2L), s"fast=$fast")
      assert(sig(1L) != sig(3L), s"fast=$fast")
      assert(sig.values.flatten.forall {
        case l: Long => l >= 0L && l < (1L << 32); case _ => false })
    }
    val md5Sig = TextOps.minhashSignatures(docs, "doc_id", "text", 4,
      fastHash = false).collect().map(_.toSeq.tail).toSeq
    val fastSig = TextOps.minhashSignatures(docs, "doc_id", "text", 4,
      fastHash = true).collect().map(_.toSeq.tail).toSeq
    assert(md5Sig != fastSig, "families must differ in value")
    // the PUBLIC default is the fast family (the md5 family exists for
    // oracle reproducibility and must be requested explicitly)
    val defSig = TextOps.minhashSignatures(docs, "doc_id", "text", 4)
      .collect().map(_.toSeq.tail).toSeq
    assert(defSig.toSet == fastSig.toSet && defSig.toSet != md5Sig.toSet,
      "default must be the fast-hash family")
    // winnow: both paths yield non-empty distinct fingerprint sets that
    // agree for identical docs and differ across families
    val fp = docs.select(col("doc_id"),
      TextOps.winnowFingerprints(col("text"), fastHash = false).as("slow"),
      TextOps.winnowFingerprints(col("text"), fastHash = true).as("fast"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    fp.foreach { case (id, slow, fastV) =>
      assert(slow.nonEmpty && fastV.nonEmpty, s"doc $id")
      assert(slow != fastV, s"doc $id: families must differ")
      assert(slow.distinct == slow && fastV.distinct == fastV)
    }
    val byId = fp.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == byId(2L)._2 && byId(1L)._3 == byId(2L)._3)
    // the default winnow path IS the codegen'd WinnowFast expression
    assert(org.apache.spark.sql.graftshim.ColumnShim
      .expression(TextOps.winnowFingerprints(col("text")))
      .find(_.isInstanceOf[graft.functions.TextFunctions.WinnowFast])
      .isDefined,
      "default winnowFingerprints must use the codegen'd fast kernel")
    // simhash: identical docs agree under the fast family too
    val sh = TextOps.simhash(docs, "doc_id", "text", fastHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L) && sh(1L) != sh(3L))
  }

  test("hashSplit: deterministic, total, proportional; capPerKey caps") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 2000L).map(i => (i, s"src${i % 5}")).toDF("id", "src")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split1 = docs.withColumn("split", TextOps.hashSplit(col("id"), w))
    // total: every row gets a split; deterministic: re-run identical
    val counts = split1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L && counts.keySet ==
      Set("train", "val", "test"))
    // proportionality within md5-uniformity tolerance
    assert(math.abs(counts("train") - 1600L) < 120, counts.toString)
    assert(math.abs(counts("val") - 200L) < 60, counts.toString)
    val again = docs.withColumn("split", TextOps.hashSplit(col("id"), w))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val first = split1.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(first == again)
    // the fast (xxhash64) family also assigns totally, with different
    // buckets than md5
    val fast = docs.withColumn("split",
      TextOps.hashSplit(col("id"), w, fast = true))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(fast.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(fast != first)
    // capPerKey: at most n per key, smallest order values kept
    val capped = TextOps.capPerKey(docs, "src", "id", 7)
    val perKey = capped.groupBy("src").agg(count(lit(1)).as("n"),
      max(col("id")).as("mx")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perKey.forall(_._2 == 7L))
    // ids are i with src = i%5: the 7 smallest for srcK are K, K+5, ...
    perKey.foreach { case (src, _, mx) =>
      val k = src.stripPrefix("src").toLong
      assert(mx == k + 5 * 6, s"$src kept up to $mx")
    }
  }

  test("hashSplit/capPerKey edge cases: null ids, tiny weights, __rk") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // a null id must produce a null split, never fall into the held-out
    // last split
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("id")
      .withColumn("split", TextOps.hashSplit(col("id"), w))
    val nullRows = withNull.where(col("id").isNull).collect()
    assert(nullRows.length == 1 && nullRows.head.isNullAt(1))
    assert(withNull.where(col("id").isNotNull && col("split").isNull)
      .count() == 0)
    // a weight too small for the bucket count must fail loudly, not
    // silently produce an empty split
    val tiny = intercept[IllegalArgumentException] {
      TextOps.hashSplit(col("id"), Seq("a" -> 0.0003, "b" -> 0.9997))
    }
    assert(tiny.getMessage.contains("zero"))
    // a pre-existing __graft_rk0 column must survive capPerKey untouched
    val df = (0L until 20L).map(i => (i, s"k${i % 2}", s"v$i"))
      .toDF("id", "key", "__graft_rk0")
    val capped = TextOps.capPerKey(df, "key", "id", 3)
    assert(capped.columns.toSeq == Seq("id", "key", "__graft_rk0"))
    assert(capped.count() == 6)
    assert(capped.where(col("__graft_rk0").isNull).count() == 0)
  }

  test("dedupClusters: components converge to the min reachable id") {
    val s = spark
    import s.implicits._
    // component {1,2,3,4,5,6} as a CHAIN (diameter 5 — forces several
    // propagation supersteps), component {10,11}, component {20,21,22}
    // as a star on 21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L),
      (11L, 10L),
      (21L, 20L), (21L, 22L))
      .toDF("id_a", "id_b")
    val got = TextOps.dedupClusters(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupClusters: empty pair set yields empty labels") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextOps.dedupClusters(none).count() == 0)
  }

  test("dedupClusters: reliable checkpointing matches localCheckpoint") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L),
      (11L, 10L))
      .toDF("id_a", "id_b")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val reliable = TextOps.dedupClusters(pairs,
        checkpointDir = Some(dir))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val local = TextOps.dedupClusters(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reliable == local)
    // reliable mode actually wrote superstep snapshots to the dir, AND
    // rotated them: the diameter-5 chain runs several supersteps, but
    // only the pinned edge list and the final superstep may remain —
    // one rdd-* dir per round means the rotation is dead (the r7 bug:
    // getCheckpointFile on the derived RDD was always None)
    val rddDirs = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator)
        .asScala.filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-")).toVector
      finally s.close()
    }
    assert(rddDirs.nonEmpty, "no checkpoint written")
    assert(rddDirs.size <= 2,
      s"checkpoint rotation left ${rddDirs.size} rdd dirs: $rddDirs")
  }

  test("dedupClustersStar matches propagation on chains, stars, random") {
    val s = spark
    import s.implicits._
    def labels(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // deep chain (diameter 119 — the shape propagation hates), star,
    // isolated pair
    val chain = (1L until 120L).map(i => (i, i + 1)) ++
      Seq((500L, 501L), (200L, 201L), (200L, 202L), (200L, 203L))
    val chainDf = chain.toDF("id_a", "id_b")
    assert(labels(TextOps.dedupClustersStar(chainDf)) ==
      labels(TextOps.dedupClusters(chainDf, maxIter = 200)))
    // random graph, fixed seed
    val rnd = new scala.util.Random(11)
    val randomPairs = (0 until 400).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val rdf = randomPairs.toDF("id_a", "id_b")
    assert(labels(TextOps.dedupClustersStar(rdf)) ==
      labels(TextOps.dedupClusters(rdf, maxIter = 200)))
    // empty input
    assert(TextOps.dedupClustersStar(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // ids appearing only in self-pairs still get a label (contract
    // parity with dedupClusters, whose edge list keeps the endpoint)
    val selfDf = Seq((7L, 7L), (1L, 2L)).toDF("id_a", "id_b")
    assert(labels(TextOps.dedupClustersStar(selfDf)) ==
      Seq(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(labels(TextOps.dedupClustersStar(selfDf)) ==
      labels(TextOps.dedupClusters(selfDf)))
  }

  test("unigramLogProb: hand-computed corpus model") {
    val s = spark
    import s.implicits._
    // corpus: a×3, b×2, c×1 over 6 total words
    // doc 1 "a b a": mean log10 of (3/6, 2/6, 3/6)
    // doc 2 "b c a": mean log10 of (2/6, 1/6, 3/6)
    val docs = Seq((1L, "a b a"), (2L, "b c a")).toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def m(ps: Double*) =
      BigDecimal(ps.map(math.log10).sum / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, m(0.5, 2.0 / 6, 0.5))))
    assert(out(2L) == ((3L, m(2.0 / 6, 1.0 / 6, 0.5))))
  }

  test("repetitionStats: hand-computed fractions, short docs dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // words: [a b a b c], bigrams: "a b","b a","a b","b c" →
      // dup_word 1-3/5=0.4, top 2/4=0.5, rep 2/4=0.5
      (1L, "a b a b c"),
      // all-distinct words, every bigram unique
      (2L, "one two three four"),
      // degenerate: "x x x x" → dup 0.75, top/rep = 3/3 = 1.0
      (3L, "x x x x"),
      // single word: no bigram signal, absent from output
      (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((0.4, 0.5, 0.5)))
    assert(out(2L) == ((0.0, 0.333333, 0.0)))
    assert(out(3L) == ((0.75, 1.0, 1.0)))
  }

  test("decontaminate: n-gram overlap removal, no short-doc fallback") {
    val s = spark
    import s.implicits._
    def words(pre: String, a: Int, b: Int) =
      (a to b).map(i => s"$pre$i").mkString(" ")
    val bench = Seq(
      (100L, words("w", 1, 13)),          // exactly one 13-gram: w1..w13
      (101L, words("s", 1, 5)))           // 5 words: NO gram at n=13
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains w1..w13 as a run inside a longer doc → contaminated
      (1L, "x0 " + words("w", 1, 13) + " x1 x2"),
      // shares only a 12-word run (w2..w13) → clean
      (2L, words("w", 2, 13) + " y1 y2"),
      // identical to the SHORT benchmark doc: no gram on either side,
      // so the 13-gram rule cannot flag it → clean
      (3L, words("s", 1, 5)),
      // unrelated → clean
      (4L, words("z", 1, 20)))
      .toDF("doc_id", "text")
    val kept = TextOps.decontaminate(corpus, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L, 4L))
    // at n=12 the w2..w13 run is itself a gram → doc 2 flagged too
    val kept12 = TextOps.decontaminate(corpus, bench, "doc_id", "text", n = 12)
      .select("doc_id").as[Long].collect().sorted
    assert(kept12.toSeq == Seq(3L, 4L))
    // the md5 oracle path removes the same documents as the (default)
    // fast-hash path
    val keptMd5 = TextOps
      .decontaminate(corpus, bench, "doc_id", "text", fastHash = false)
      .select("doc_id").as[Long].collect().sorted
    assert(keptMd5.toSeq == Seq(2L, 3L, 4L))
  }

  test("prefixSum/packShards: two-pass scan equals the global window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // hand-computed: exclusive offsets 0,3,8,10; budget 5 → shards 0,0,1,2
    val docs = Seq(
      (10L, "a b c"), (20L, "d e f g h"), (30L, "i j"), (40L, "k l m"))
      .toDF("doc_id", "text")
    val packed = TextOps.packShards(docs, "doc_id", "text", 5L)
      .select("doc_id", "tok_offset", "shard_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq(
      (10L, 0L, 0L), (20L, 3L, 0L), (30L, 8L, 1L), (40L, 10L, 2L)))
    // more ids than buckets: the bucketed scan must equal the plain
    // single-partition global window on the same data (null order
    // rows excluded, null values contribute nothing)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i * 3L, if (i % 41 == 0) null else Integer.valueOf(rnd.nextInt(50))))
    val df = (rows :+ ((-1L, Integer.valueOf(9)))).toDF("id", "v")
      .withColumn("id", when(col("id") === -1L, lit(null)).otherwise(col("id")))
    val got = TextOps.prefixSum(df, "id", "v", "ps", buckets = 8)
      .select("id", "ps").as[(Long, Long)].collect().toMap
    val expect = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, v)) =>
      (id, acc + Option(v).map(_.toLong).getOrElse(0L))
    }.sliding(2).map { case Seq((_, prev), (id, _)) => id -> prev }.toMap
    assert(got == expect)
    // all-null values: every bucket total is NULL — must not NPE
    val allNull = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val z = TextOps.packShards(allNull, "doc_id", "text", 5L)
      .select("tok_offset").as[Long].collect()
    assert(z.toSeq == Seq(0L, 0L))
  }

  test("leakageSafeSplit: near-dup clusters never straddle splits") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3} via chain, {10,11}; rest unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = TextOps.leakageSafeSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out.size == 60) // total: every doc assigned
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size == 1,
      "cluster {1,2,3} must share cluster_id AND split")
    assert(Seq(10L, 11L).map(out(_)).distinct.size == 1)
    assert(out(20L)._1 == 20L) // unpaired docs label themselves
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the split IS the hashSplit of the CLUSTER id: members inherit the
    // label doc's assignment, and unpaired docs keep their own
    val own = docs.withColumn("split", TextOps.hashSplit(col("doc_id"),
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Seq(1L, 2L, 3L).forall(i => out(i)._2 == own(1L)))
    assert(Seq(10L, 11L).forall(i => out(i)._2 == own(10L)))
    assert((12L to 60L).forall(i => out(i)._2 == own(i)))
  }

  test("null text/id semantics: langId, qualityScore, hashSplit") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Option("the of and to a in some english words")),
        (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.langId(col("text")).as("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "en")
    // size(null) = -1 would otherwise score null docs as "en"/~0.6
    assert(out(2L).isNullAt(1), "null text must yield null language")
    assert(out(2L).isNullAt(2), "null text must yield null quality")
    // null ids must yield null splits on BOTH hash paths —
    // xxhash64(null) is the seed (42), not null, so the fast path
    // needs the explicit id guard
    for (fast <- Seq(false, true)) {
      val splits = Seq(Option(7L), Option.empty[Long]).toDF("id")
        .select(col("id"), TextOps.hashSplit(col("id"),
          Seq("train" -> 0.8, "test" -> 0.2), fast = fast).as("split"))
        .collect()
      assert(splits.count(r => !r.isNullAt(0) && !r.isNullAt(1)) == 1)
      assert(splits.count(r => r.isNullAt(0)) == 1)
      assert(splits.filter(_.isNullAt(0)).forall(_.isNullAt(1)),
        s"fast=$fast: null id must yield null split")
    }
  }

  test("prefixSum rejects non-integral value columns loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      TextOps.prefixSum(df, "id", "v", "cum")
    }
    assert(e.getMessage.contains("integral"))
  }
}
