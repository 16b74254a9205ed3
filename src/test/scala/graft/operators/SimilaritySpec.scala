package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  /** Deterministic clustered vectors: `n` points around `centers` with
    * small jitter — near-neighbors are intra-cluster by construction. */
  private def clustered(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4, dim)(rnd.nextGaussian())
    (0L until n).map { id =>
      val c = centers((id % 4).toInt)
      (id, c.map(v => (v + rnd.nextGaussian() * 0.15).toFloat))
    }
  }

  test("hyperplane buckets: deterministic, non-degenerate, correlated-safe") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val b1 = df.select(Similarity.hyperplaneBucket(col("vec"), dim, 6).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b2 = df.select(Similarity.hyperplaneBucket(col("vec"), dim, 6).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 == b2) // plan-time planes → identical across runs
    assert(b1.distinct.size > 1, "hyperplanes must actually split the space")
    // different seed → different partitioning (overwhelmingly likely)
    val b3 = df.select(
      Similarity.hyperplaneBucket(col("vec"), dim, 6, seed = 99L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 != b3)
  }

  test("seeded-hyperplane bucketed top-k recall vs brute force") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val k = 5
    val exact = Similarity.bruteForceTopK(df, df, "id", "vec", k)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.bucketedTopK(df, df, "id", "vec", k, bits = 4,
      seededDim = Some(dim))
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 bits over 4 tight clusters: intra-cluster neighbors nearly always
    // share all hyperplane signs; demand a solid margin, not perfection
    assert(recall >= 0.7, s"recall $recall")
    // and the candidate set was actually pruned (not one giant bucket)
    val buckets = df.select(
      Similarity.hyperplaneBucket(col("vec"), dim, 4).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length > 1)
  }

  test("banded top-k: recall on clusters, high-cardinality band keys") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val k = 5
    val exact = Similarity.bruteForceTopK(df, df, "id", "vec", k)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands × 8 bits: each band needs all 8 signs to agree, but ANY of
    // the 4 bands suffices — recall should beat the single-bucket scheme
    val banded = Similarity.bandedTopK(df, df, "id", "vec", k, dim,
      bands = 4, bitsPerBand = 8)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & banded).size.toDouble / exact.size
    assert(recall >= 0.8, s"banded recall $recall")
    // band keys are content-derived with 2^bits cardinality per band, not
    // a fixed global partition: the distinct (band, key) count must exceed
    // any capped bucket scheme's 2^4
    val keys = df.select(posexplode(array(
        Similarity.bandKeys(col("vec"), dim, 4, 8): _*)).as(Seq("band", "key")))
      .select("band", "key").distinct().count()
    assert(keys > 16, s"distinct band keys $keys")
  }

  test("banded top-k recovers planted near-duplicates") {
    import spark.implicits._
    val dim = 16
    val base = clustered(120, dim)
    val mult = Similarity.perturbMultipliers(5L, dim)
    // queries: perturbed copies of every 10th vector, same id
    val queries = base.collect { case (id, v) if id % 10 == 0 =>
      (id, v.indices.map(j => (v(j) * mult(j)).toFloat).toArray)
    }.toDF("id", "vec")
    val cands = base.toDF("id", "vec")
    val top = Similarity.bandedTopK(queries, cands, "id", "vec", k = 1, dim,
      bands = 4, bitsPerBand = 8)
      .where(col("rank") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every planted neighbor recovered at rank 1 (sim ≈ 0.9996 dominates)
    val recovered = top.count { case (q, c) => q == c }
    assert(recovered >= top.size - 1 && top.size >= 11,
      s"recovered $recovered of ${top.size}")
  }

  test("ivf top-k works with non-numeric (string) id columns") {
    import spark.implicits._
    val dim = 16
    // string doc ids — the quantizer must keep the id's original type
    // (the r8 literal-centroid rewrite initially cast ids to long,
    // which nulled every string id at plan construction)
    val df = clustered(80, dim)
      .map { case (id, v) => (f"doc$id%03d", v) }.toDF("id", "vec")
    val got = Similarity.ivfTopK(df.where(col("id") < "doc010"), df,
        "id", "vec", k = 1, nCells = 4, nProbe = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.size == 10 && got.forall { case (q, c) => q == c },
      s"string-id self-recovery failed: $got")
  }

  test("ivf top-k: self-recovery, in-cell candidates, nProbe recall") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val queries = df.where(col("id") < 20)
    val got = Similarity.ivfTopK(queries, df, "id", "vec", k = 3,
        nCells = 8, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // every query finds itself at rank 1 (it lives in its own cell)
    val rank1 = got.filter(_._3 == 1).map(t => (t._1, t._2)).toMap
    assert((0L until 20L).forall(q => rank1.get(q).contains(q)),
      s"rank-1 self-recovery failed: $rank1")
    // rank 2 stays in the query's planted cluster (ids mod 4 agree) for
    // nearly all queries — the clusters are well-separated
    val rank2 = got.filter(_._3 == 2)
    val intra = rank2.count { case (q, c, _) => q % 4 == c % 4 }
    assert(intra >= rank2.size - 2, s"intra-cluster rank-2: $intra/${rank2.size}")
    // wider probing never shrinks the candidate pool: sims at rank 2
    // with nProbe=4 are >= those with nProbe=1 for every query
    def rank2Sim(nProbe: Int): Map[Long, Double] =
      Similarity.ivfTopK(queries, df, "id", "vec", k = 3,
          nCells = 8, nProbe = nProbe)
        .where(col("rank") === 2).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wide = rank2Sim(4)
    val narrow = rank2Sim(1)
    assert(narrow.keySet.forall(q => wide(q) >= narrow(q) - 1e-12))
    // non-dense id spaces still produce centroids (lowest ids present,
    // not `id < nCells`)
    val shifted = clustered(60, dim).map { case (id, v) => (id + 1000L, v) }
      .toDF("id", "vec")
    val sgot = Similarity.ivfTopK(shifted.where(col("id") < 1010L),
        shifted, "id", "vec", k = 1, nCells = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sgot.nonEmpty && sgot.forall { case (q, c) => q == c },
      s"shifted-id self-recovery failed: $sgot")
  }

  test("embedding dedup: planted near-dups cluster, singletons self-label") {
    import spark.implicits._
    val dim = 32
    val base = clustered(60, dim)
    // plant a near-identical copy of each vector at id+1000 (tiny scale
    // perturbation keeps cosine ≈ 1) — these MUST pair with the original
    val planted = base.map { case (id, v) => (id + 1000L, v.map(x => x * 1.0001f)) }
    val df = (base ++ planted).toDF("id", "vec")
      .select(col("id"), transform(col("vec"), x => x.cast("double")).as("vec"))
    // pairs: each unordered pair once, sim filter applied
    val pairs = Similarity.bandedNearDupPairs(df, "id", "vec",
      threshold = 0.999, dim = dim, bands = 8, bitsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
    val clusters = Similarity.embeddingDedupClusters(df, "id", "vec",
      threshold = 0.999, dim = dim, bands = 8, bitsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters.size == 120) // every id labeled exactly once
    // scaled copies have cosine exactly 1 to their original; with 8 bands
    // of 8 bits each, missing all bands is vanishingly unlikely — and a
    // same-cluster plant must share its original's label
    val paired = base.count { case (id, _) => clusters(id + 1000L) == clusters(id) }
    assert(paired >= 55, s"only $paired/60 planted near-dups were clustered")
    // labels are component minima: every label is a member labeling itself
    clusters.values.foreach(c => assert(clusters(c) == c))
  }

  test("ann recall@10 floor on the testdata embedding corpus") {
    // the SAME configs the bench records (graft.AnnRecall) — a recall
    // regression in either production path fails here loudly instead of
    // silently shipping a worse number in bench_out. The floor applies
    // to TRUE-NEIGHBOR pairs (sim >= 0.5, the planted structure);
    // unconditioned recall@10 on this isotropic corpus is dominated by
    // nearest-random-point pairs no sublinear index can recover, so it
    // only gets a loose sanity bound.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ex = graft.AnnRecall.exact(emb).persist()
    try {
      val exTrue = ex.where(col("sim") >= graft.AnnRecall.trueNbrSim)
      for ((name, approx) <- Seq(
          "bandedTopK" -> graft.AnnRecall.banded(emb),
          "ivfTopK" -> graft.AnnRecall.ivf(emb),
          "ivfPqTopK" -> graft.AnnRecall.ivfpq(emb))) {
        val trueNbr = graft.AnnRecall.recallOf(exTrue, approx)
        assert(trueNbr >= graft.AnnRecall.floor,
          s"$name true-neighbor recall@10 $trueNbr < ${graft.AnnRecall.floor}")
        val overall = graft.AnnRecall.recallOf(ex, approx)
        assert(overall >= 0.2, s"$name overall recall@10 $overall < 0.2")
      }
    } finally ex.unpersist(blocking = false)
  }

  test("ann UNCONDITIONED recall@10 floor on the clustered corpus") {
    // Gaussian-blob corpus (graft.AnnRecall.clusteredCorpus): every
    // vector's exact top-10 is its blob mates, so unconditioned recall
    // is meaningful here — the number the isotropic testdata corpus
    // cannot provide. Same production configs as the bench record;
    // smaller n than the bench (600/30 blobs of 20) keeps the spec
    // fast while preserving the geometry (blob size 20 > k=10,
    // within-blob cosine ~0.89, inter-blob ~0).
    val cl = graft.AnnRecall.clusteredCorpus(spark, n = 600,
      nClusters = 30).persist()
    val ex = graft.AnnRecall.exact(cl).persist()
    try {
      for ((name, approx) <- Seq(
          "bandedTopK" -> graft.AnnRecall.banded(cl),
          "ivfTopK" -> graft.AnnRecall.ivf(cl),
          "ivfPqTopK" -> graft.AnnRecall.ivfpq(cl))) {
        val r = graft.AnnRecall.recallOf(ex, approx)
        assert(r >= graft.AnnRecall.clusteredFloor,
          s"$name clustered recall@10 $r < ${graft.AnnRecall.clusteredFloor}")
      }
    } finally {
      ex.unpersist(blocking = false)
      cl.unpersist(blocking = false)
    }
  }

  test("embedding dedup: persistInput caches the projection and unpersists") {
    import spark.implicits._
    val dim = 16
    val base = clustered(40, dim)
    val planted = base.map { case (id, v) => (id + 1000L, v.map(_ * 1.0001f)) }
    val df = (base ++ planted).toDF("id", "vec")
    // capture every executed plan during the call: the snapshot roll of
    // the initial edge list runs while the projection is persisted, so
    // its executed plan must read the cache (InMemoryTableScan)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.catalog.clearCache()
    spark.listenerManager.register(listener)
    val persisted =
      try {
        val out = Similarity.embeddingDedupClusters(df, "id", "vec",
          threshold = 0.999, dim = dim, bands = 8, bitsPerBand = 8,
          persistInput =
            Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // listener delivery is async — wait for the cached-scan evidence
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!plans.iterator().asScala.exists(
            _.contains("InMemoryTableScan")) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        out
      } finally spark.listenerManager.unregister(listener)
    assert(plans.iterator().asScala.exists(_.contains("InMemoryTableScan")),
      s"no executed plan read the persisted projection " +
        s"(${plans.size()} plans captured)")
    // the cache is dropped before the operator returns
    assert(spark.sharedState.cacheManager.isEmpty,
      "persistInput left the projection cached after returning")
    val default = Similarity.embeddingDedupClusters(df, "id", "vec",
        threshold = 0.999, dim = dim, bands = 8, bitsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(persisted == default, "persistInput changed the labeling")
  }

  test("zero-norm vectors never enter top-k results or near-dup pairs") {
    val s = spark
    import s.implicits._
    val dim = 8
    val good = (0L until 12L).map(i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 17 + j + 1).toFloat)))
    // id 50: all-zero vector (NaN cosine would rank FIRST if kept);
    // id 51: a NaN component; id 52: an Inf component (norm Inf passes
    // a > 0 && !isnan check but yields Inf/Inf = NaN sims)
    val poisoned = good ++ Seq(
      (50L, Array.fill(dim)(0f)),
      (51L, Array.tabulate(dim)(j => if (j == 0) Float.NaN else 1f)),
      (52L, Array.tabulate(dim)(j =>
        if (j == 0) Float.PositiveInfinity else 1f)))
    val df = poisoned.toDF("id", "vec")
    for (topk <- Seq(
        Similarity.bruteForceTopK(df, df, "id", "vec", 3),
        Similarity.bucketedTopK(df, df, "id", "vec", 3),
        Similarity.bandedTopK(df, df, "id", "vec", 3, dim),
        Similarity.ivfTopK(df, df, "id", "vec", 3, nCells = 4))) {
      val rows = topk.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getLong(0) < 50L && r.getLong(1) < 50L))
      assert(rows.forall(r => !r.getDouble(2).isNaN))
    }
    for (pairs <- Seq(
        Similarity.nearDupPairs(df, "id", "vec", 0.5),
        Similarity.bandedNearDupPairs(df, "id", "vec", 0.5, dim))) {
      assert(pairs.collect().forall(r =>
        r.getLong(0) < 50L && r.getLong(1) < 50L))
    }
    // the quantizer skips them too: id 50/51 sort below nCells=4 ids
    // only if included — centroids must all be usable
    val ivf = Similarity.ivfTopK(df.orderBy(col("id").desc), df, "id",
      "vec", 2, nCells = 14)
    assert(ivf.collect().forall(r => !r.getDouble(2).isNaN))
    // kmeans drops NON-FINITE vectors like the search paths (a NaN
    // element quantizes to a null long and corrupts cell 0's centroid)
    // but KEEPS the zero vector — zero is a perfectly valid point in
    // L2 space; it is junk only under cosine. 12 clean + 1 zero = 13.
    val km = Similarity.kmeansFixedPoint(df, "id", "vec", k = 2,
      iters = 1, dim = dim)
    val kmRows = km.collect()
    assert(kmRows.map(_.getLong(1)).sum == 13L,
      s"NaN/Inf vectors leaked into kmeans cells: ${kmRows.mkString}")
  }

  test("inf centroid candidates, wrong-length and null-id vectors are inert") {
    val s = spark
    import s.implicits._
    val dim = 8
    val good = (2L until 14L).map(i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 17 + j + 1).toFloat)))
    // id 0: Inf component with the LOWEST id — without the quantizer's
    // Infinity bound it would become centroid #1, every cosine against
    // it NaN, and (NaN ranks greatest) swallow ALL cell assignments;
    // id 1: wrong-length vector — un-guarded, its null band bits would
    // collide all such vectors on band key 0 and its null centroid
    // sims would stick it to the first cell
    val poisoned = good ++ Seq(
      (0L, Array.tabulate(dim)(j =>
        if (j == 0) Float.PositiveInfinity else 1f)),
      (1L, Array.fill(dim + 3)(0.5f)))
    val df = poisoned.toDF("id", "vec")
    for (topk <- Seq(
        Similarity.bandedTopK(df, df, "id", "vec", 3, dim),
        // dim is REQUIRED for safety here: without it the wrong-length
        // id-1 vector becomes centroid #1 and the assignment filter,
        // deriving its expected length from that centroid, would drop
        // the entire well-formed corpus instead
        Similarity.ivfTopK(df, df, "id", "vec", 3, nCells = 4,
          dim = Some(dim)))) {
      val rows = topk.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getLong(0) >= 2L && r.getLong(1) >= 2L))
      assert(rows.forall(r => !r.getDouble(2).isNaN))
      // every clean query keeps its own per-query top-k (no collapsed
      // single-cell degeneration)
      assert(rows.map(_.getLong(0)).distinct.length == good.length)
    }
    // null ids are dropped, not merged into one shared top-k window
    val withNull = good.map { case (i, v) => (java.lang.Long.valueOf(i), v) } ++
      Seq((null.asInstanceOf[java.lang.Long], good.head._2),
        (null.asInstanceOf[java.lang.Long], good.last._2))
    val dfn = withNull.toDF("id", "vec")
    val bf = Similarity.bruteForceTopK(dfn, dfn, "id", "vec", 3).collect()
    assert(bf.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    assert(bf.map(_.getLong(0)).distinct.length == good.length)
  }
}
