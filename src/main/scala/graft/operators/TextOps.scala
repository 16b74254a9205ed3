package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators for large-scale document
  * pipelines (the LLM-data-prep extension layer; BASELINE.json north star).
  *
  * Everything here is built from `org.apache.spark.sql.functions` — no
  * UDFs — so every shuffle benefits from map-side partial aggregation.
  * Scalar pipelines stay inside whole-stage codegen; the higher-order
  * array functions (transform/filter/aggregate) evaluate interpreted,
  * which is why array-valued subexpressions must be let-bound (see
  * [[TextOps.bind]]) rather than referenced inside lambdas. The hash
  * primitive (first 8 hex chars of md5 → int) is deliberately
  * reproducible in any SQL engine, which is also how the DuckDB oracle
  * cross-checks these operators.
  */
object TextOps {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** 32-bit base hash of a string. `fast = false` (this building
    * block's default — note the PUBLIC operators above it default to
    * fast): first 8 hex digits of md5, reproducible in any SQL engine,
    * which is how the DuckDB oracle mirrors every hash-derived
    * operator. `fast = true`: xxhash64 masked to 32 bits — an order of
    * magnitude cheaper per gram (no digest, no hex round-trip; fully
    * codegen'd), what the public operators run by default. Both stay
    * in [0, 2^32) so the minhash linear family's products remain exact
    * in 64-bit ints. */
  def baseHash(c: Column, fast: Boolean = false): Column =
    if (fast) xxhash64(c).bitwiseAND(lit(0xFFFFFFFFL))
    else conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ------------------------------------------------------------- minhash

  /** Fixed linear-hash family for minhash: h_j(x) = (A(j)*x + B(j)) mod P.
    * A(j) ≤ 10^6 and x < 2^32 keeps the product < 2^52 — exact in Long
    * (and in any engine's 64-bit int). */
  val MinhashA: Seq[Long] = Seq(712371L, 431071L, 280081L, 918209L,
    160289L, 555601L, 997813L, 331777L)
  val MinhashB: Seq[Long] = Seq(136607L, 982451L, 276037L, 661619L,
    104729L, 870967L, 350377L, 490019L)
  val MinhashP: Long = 2038074743L

  /** Word 3-gram shingles; documents shorter than 3 words fall back to the
    * truncated tail slice so every NON-NULL document has ≥1 shingle.
    * Null text yields a null array — without that contract,
    * `concat_ws(" ", slice(null, ...))` is the EMPTY STRING, so every
    * null-text doc would share a [""] shingle with every empty-string
    * doc, minhash identically, jaccard 1.0, and be silently deleted by
    * dedup as their "duplicate". A null array explodes to no rows:
    * null docs simply carry no dedup signal.
    *
    * One codegen'd kernel call ([[graft.functions.TextFunctions
    * .WordShingles]], value-identical to the HOF formulation the
    * oracle mirrors — parity spec-pinned): the r13
    * `transform`+`slice`+`concat_ws` form was `CodegenFallback`,
    * whose megamorphic interpreted lambda dispatch per shingle made
    * q50's cost flip with UNRELATED code-size changes (the r14 bisect
    * landed on a commit q50 never executes). */
  def shingles(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.TextFunctions.WordShingles(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text)))

  /** Per-document minhash signatures.
    *
    * Explode shingles → hash → `groupBy(doc).agg(min...)`: the mins are
    * partially aggregated map-side, so the shuffle carries one row per
    * (document × partition), not per shingle — this is the 100 TB path.
    *
    * @return dataframe of (idCol, s0..s{k-1})
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, fastHash: Boolean = true): DataFrame = {
    require(k <= MinhashA.size, s"at most ${MinhashA.size} signatures")
    val sh = docs.select(col(idCol), explode(shingles(col(textCol))).as("__sh"))
      .withColumn("__h", baseHash(col("__sh"), fastHash))
    val sigs = (0 until k).map(j =>
      min((col("__h") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"s$j"))
    sh.groupBy(col(idCol)).agg(sigs.head, sigs.tail: _*)
  }

  /** LSH candidate pairs: documents agreeing on all signatures of at least
    * one band. `bandSize` signatures per band, `k/bandSize` bands. A pair
    * appearing in several bands is emitted once (dedup on the id pair).
    * The band join is a plain equi-join on the band key — broadcastable
    * when the signature table is small, AQE-skew-splittable when not.
    */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
      k: Int = 8, bandSize: Int = 2): DataFrame = {
    // a non-dividing bandSize would silently leave the trailing
    // signature columns out of every band key — dead minhashes, lower
    // recall, no error
    require(k > 0 && bandSize > 0 && k % bandSize == 0,
      s"bandSize $bandSize must divide k $k (trailing signatures " +
        "would silently not contribute to candidate recall)")
    val nBands = k / bandSize
    val banded = signatures.select(
      col(idCol),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_",
            (0 until bandSize).map(j => col(s"s${b * bandSize + j}")): _*)
            .as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact word-3-gram Jaccard similarity between two shingle-array
    * columns (set semantics). */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double")

  /** Superstep snapshot function for the iterative clustering
    * operators. Default: `localCheckpoint` (executor-block storage,
    * lost on executor failure). With `checkpointDir`: reliable
    * `checkpoint()` that survives executor loss — the checkpoint dir is
    * set only if the context has none (never silently redirecting the
    * application's own setting), and each superstep deletes the
    * PREVIOUS round's checkpoint files once the new one is
    * materialized, so durable storage holds ~one copy instead of one
    * per round (Spark's own cleaner only runs with
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, off by
    * default). */
  private final class Snapshotter(pairs: DataFrame,
      checkpointDir: Option[String]) {
    checkpointDir.foreach { d =>
      val sc = pairs.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    private def base(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      // serialized storage, like IntervalOps.materializeInputs: the
      // deserialized default pins one UnsafeRow object per row per
      // superstep until the ContextCleaner runs (r21)
      else df.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    /** Snapshot that outlives the whole iteration (never cleaned up
      * mid-run — e.g. the edge list every superstep joins against). */
    def pin(df: DataFrame): DataFrame = base(df)

    /** Rotating superstep snapshot: once the new checkpoint is
      * materialized, the PREVIOUS rotating checkpoint's files are
      * deleted (reliable mode only), so durable storage holds ~one
      * copy instead of one per round — Spark's own cleaner runs only
      * with `spark.cleaner.referenceTracking.cleanCheckpoints`, off by
      * default. */
    private var prev: Option[String] = None

    /** The checkpoint file of the nearest checkpointed ANCESTOR:
      * `Dataset.checkpoint` returns a frame whose `.rdd` is a derived
      * (deserializing) RDD — its own `getCheckpointFile` is always None,
      * so the location must be read off the lineage. */
    private def checkpointFileOf(rdd: org.apache.spark.rdd.RDD[_])
        : Option[String] =
      rdd.getCheckpointFile.orElse(
        rdd.dependencies.view.flatMap(d => checkpointFileOf(d.rdd))
          .headOption)

    def roll(df: DataFrame): DataFrame = {
      val snapped = base(df)
      if (checkpointDir.isDefined) {
        val file = checkpointFileOf(snapped.queryExecution.toRdd)
        prev.filter(p => !file.contains(p)).foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(
              graft.sources.common.GraftHadoop.conf()).delete(path, true)
          } catch { case _: Exception => () } // cleanup is best-effort
        }
        prev = file
      }
      snapped
    }
  }

  /** Near-duplicate CLUSTERS from verified pair edges: connected
    * components by iterative min-label propagation — each member of a
    * component converges to the smallest doc id reachable from it, the
    * canonical representative a dedup pipeline keeps.
    *
    * Scale shape: each superstep is one equi-join + partial-aggregated
    * groupBy over the edge list; the driver only checks a one-row
    * convergence aggregate per step (the standard Spark
    * connected-components pattern — iteration control on the driver,
    * data never leaves the cluster) and a checkpoint truncates the
    * growing lineage each superstep. Steps needed = component diameter,
    * which for near-dup clusters is small; `maxIter` bounds
    * pathological chains. Only ids that appear in an edge are returned
    * (singletons are their own cluster implicitly).
    *
    * Checkpoint durability: by default supersteps use
    * `localCheckpoint`, which stores blocks on executors — fast, but an
    * executor loss mid-iteration fails the job unrecoverably, which at
    * 100 TB over long-running clusters is a real event. Pass
    * `checkpointDir` (HDFS/S3 path) to use reliable `checkpoint`
    * storage that survives executor loss, at the cost of writing each
    * superstep to the filesystem. */
  def dedupClusters(pairs: DataFrame, a: String = "id_a",
      b: String = "id_b", maxIter: Int = 30,
      checkpointDir: Option[String] = None): DataFrame = {
    val snap = new Snapshotter(pairs, checkpointDir)
    // edges are joined in EVERY superstep: pinned, never rotated away
    val edges = snap.pin(pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct())
    var labels = snap.roll(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts the min label among itself and its neighbors;
      // the previous label rides along so convergence is read off the
      // same materialized frame without a second join
      val nbrMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      val updated = snap.roll(labels.join(nbrMin,
          labels("doc_id") === nbrMin("src"), "left")
        .select(col("doc_id"), col("cluster_id").as("__old"),
          least(col("cluster_id"), coalesce(col("nbr_min"),
            col("cluster_id"))).as("cluster_id")))
      converged = updated.where(col("cluster_id") =!= col("__old")).isEmpty
      labels = updated.drop("__old")
      iter += 1
    }
    labels
  }

  /** Near-duplicate clusters by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * the deep-component scale path complementing [[dedupClusters]].
    *
    * Min-label propagation needs O(component diameter) supersteps —
    * fine for near-dup clusters (shallow by construction), quadratic
    * pain on pathological chains. The star operations contract every
    * node toward its component minimum in O(log n) rounds regardless of
    * diameter: large-star hangs every neighbor larger than `u` off
    * `u`'s current minimum; small-star re-hangs `u` and its smaller
    * neighbors likewise. Each round is two equi-joins + two partial
    * aggregates over the (shrinking) edge list; convergence is read
    * from an order-independent checksum aggregate (count + sums +
    * hash-sum), one driver-side row per round.
    *
    * Output matches [[dedupClusters]]: (doc_id, cluster_id = component
    * minimum) for every id that appears in an edge. */
  def dedupClustersStar(pairs: DataFrame, a: String = "id_a",
      b: String = "id_b", maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // every id that appears in any input pair (self-pairs included)
    // must get a label, matching dedupClusters' contract
    val nodes = pairs.select(col(a).as("doc_id"))
      .unionAll(pairs.select(col(b).as("doc_id"))).distinct()
    val starLabels = starContractionLabels(pairs, a, b, maxIter,
      checkpointDir)
    nodes.join(starLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** The contraction loop of [[dedupClustersStar]] alone: runs the
    * large-star/small-star rounds EAGERLY (each round's edge list is
    * snapshotted and its checksum collected) and returns
    * (doc_id, cluster_id) for every id in the FINAL edge list — ids
    * seen only in self-pairs are absent and must be coalesced to
    * themselves by the caller's outer join. Crucially the returned plan
    * derives from the last snapshot only, never from `pairs`: callers
    * that persist the frames feeding `pairs`
    * ([[Similarity.embeddingDedupClusters]] with `persistInput`) can
    * unpersist before their result is consumed. */
  private[graft] def starContractionLabels(pairs: DataFrame,
      a: String = "id_a", b: String = "id_b", maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val snap = new Snapshotter(pairs, checkpointDir)

    // edges kept directed high → low (u > v), deduped
    def largeStar(edges: DataFrame): DataFrame = {
      val both = edges.unionAll(
        edges.select(col("v").as("u"), col("u").as("v")))
      val mins = both.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      both.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    def smallStar(edges: DataFrame): DataFrame = {
      val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
      val j = edges.join(mins, "u")
      j.select(col("v").as("u"), col("m").as("v"))
        .unionAll(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    def checksum(edges: DataFrame): (Long, Long, Long, Long) = {
      // each round's edge list is distinct(), so count + XOR-folds over
      // a SET are an order-independent checksum with no overflow — and,
      // unlike the earlier decimal(38,0) hash-sums, the aggregate
      // codegen is plain long arithmetic (the decimal version dominated
      // the operator's cold first-run cost)
      val r = edges.agg(count(lit(1)),
        coalesce(bit_xor(col("u")), lit(0L)),
        coalesce(bit_xor(col("v")), lit(0L)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

    var edges = snap.roll(pairs
      .select(greatest(col(a), col(b)).as("u"),
        least(col(a), col(b)).as("v"))
      .where(col("u") =!= col("v")).distinct())
    var sig = checksum(edges)
    var iter = 0
    var done = edges.isEmpty
    while (!done && iter < maxIter) {
      val next = snap.roll(smallStar(largeStar(edges)))
      val nsig = checksum(next)
      done = nsig == sig
      edges = next
      sig = nsig
      iter += 1
    }
    // fixpoint is a star forest: u → component min; the minima label
    // themselves, and ids seen only in self-pairs are their own cluster.
    // The min-aggregate keeps the output one-row-per-doc even when the
    // loop exits via maxIter before full convergence (a node can then
    // still carry edges toward two hubs).
    edges
      .select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionAll(edges.select(col("v").as("doc_id"),
        col("v").as("cluster_id")))
      .groupBy(col("doc_id"))
      .agg(min(col("cluster_id")).as("cluster_id"))
  }

  // ------------------------------------------------------------- simhash

  /** `bits`-wide simhash over word unigrams: bit b is set when the sum of
    * ±1 votes from each token's hash bit b is positive. One exploded pass +
    * one partially-aggregated groupBy. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, fastHash: Boolean = true): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .withColumn("__h", baseHash(col("__w"), fastHash))
    val voteCols = (0 until bits).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val votes = tok.groupBy(col(idCol)).agg(voteCols.head, voteCols.tail: _*)
    val hash = (0 until bits)
      .map(b => when(col(s"__b$b") > 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
    votes.select(col(idCol), hash.as("simhash"))
  }

  // -------------------------------------------------- fingerprint / dedup

  /** Canonical document fingerprint: md5 of the lower-cased, trimmed text.
    * Exact-dedup = groupBy(fingerprint). */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Winnowing fingerprints (rolling character k-grams + window minima,
    * the MOSS scheme): hash every k-char gram, keep the minimum of each
    * w-wide window, dedupe. Robust to local edits — two documents
    * sharing a long run share fingerprints regardless of alignment.
    * Built entirely from codegen'd kernels (no UDF). The DEFAULT is
    * the fast path (`fastHash = true` — rolling 32-bit gram hash);
    * `fastHash = false` switches to the md5-based gram hash, which is
    * reproducible in any engine and is what the DuckDB oracle gates
    * pin. Both run ONE kernel call per document
    * ([[graft.functions.TextKernels]]); the md5 branch's values are
    * bit-identical to its original HOF formulation
    * (`transform(sequence(...), i => baseHash(text.substr(i, k)))` +
    * windowed `array_min(slice(...))` + `array_distinct`), whose
    * interpreted per-position substring+digest+hex-conv and per-window
    * slice allocation dominated the gated q32 row — pinned by
    * `WinnowMd5ParitySpec` against that exact formulation. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4,
      fastHash: Boolean = true): Column =
    if (fastHash)
      // production path: one codegen'd O(n) kernel (rolling 32-bit
      // gram hash + deque window minima) instead of per-position
      // substring+digest under interpreted higher-order functions —
      // same gram/window/distinct semantics, different hash family
      graft.functions.TextFunctions.winnow_fast(text, k, w)
    else graft.functions.TextFunctions.winnow_md5(text, k, w)

  /** Exact deduplication: keep the row with the smallest `idCol` per
    * fingerprint. Window-free formulation (min + semi-join back) so both
    * stages stay partially aggregated. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.withColumn("__fp", fingerprint(col(textCol)))
    val keep = fp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
    fp.join(keep, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  /** Word n-grams with NO short-document fallback: a document of fewer
    * than `n` words — including null text — has no n-gram, yielding the
    * EMPTY array (contrast [[shingles]], whose ≥1-gram guarantee exists
    * for minhash). Codegen'd kernel, value-identical to the HOF
    * formulation (parity spec-pinned); the decontamination gate runs
    * this per corpus document at n=13. */
  def wordGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.TextFunctions.WordGrams(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text), n))

  /** Benchmark decontamination: drop every corpus document that shares
    * at least one word `n`-gram with any benchmark/eval document (the
    * GPT-3-style 13-gram overlap rule) — the step that keeps test-set
    * text out of training data.
    *
    * Shape for 100 TB: grams are hashed before the join so the shuffle
    * rows are (id, long) not (id, text); the benchmark gram set is tiny
    * relative to the corpus, so AQE broadcasts both the semi-join that
    * flags contaminated ids and the anti-join that removes them — the
    * corpus is never shuffled. Codegen'd xxhash64 grams are the default
    * (a hash collision can only over-remove, the conservative direction
    * for decontamination); `fastHash = false` switches to the md5 hash
    * the DuckDB oracle can reproduce.
    *
    * @return the corpus rows minus contaminated documents
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 13, fastHash: Boolean = true): DataFrame = {
    val cg = corpus
      .select(col(idCol), explode(wordGrams(col(textCol), n)).as("__g"))
      .select(col(idCol), baseHash(col("__g"), fastHash).as("__h"))
    val bg = benchmark
      .select(explode(wordGrams(col(textCol), n)).as("__g"))
      .select(baseHash(col("__g"), fastHash).as("__h")).distinct()
    val flagged = cg.join(bg, Seq("__h"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------ language id

  /** Stopword-marker vocabulary per language, ordered by tie-break
    * priority. A deterministic n-gram-style heuristic: score = number of
    * tokens that are marker words of the language. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(ws, w => markers.map(m => w === m).reduce(_ || _)))
    }
  }

  /** Predicted language: argmax of marker scores, ties broken by marker
    * order, "und" (undetermined) when every score is zero, null for
    * null text. The null guard is load-bearing: `size(null)` is -1
    * under Spark's default config, so without it every score would be
    * -1 and English would win the >= tie-break — null documents
    * confidently labeled "en" and surviving language filters. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    // fold from the end: earlier languages win ties via >=
    val best = scores.init.foldRight(lit(scores.last._1)) {
      case ((lang, s), acc) =>
        val later = scores.dropWhile(_._1 != lang).tail.map(_._2)
        val laterMax =
          if (later.size == 1) later.head else greatest(later: _*)
        when(s >= laterMax, lang).otherwise(acc)
    }
    when(text.isNull, lit(null).cast("string"))
      .otherwise(when(allZero, "und").otherwise(best))
  }

  // ------------------------------------------------------ quality scoring

  /** Heuristic quality score in [0,1]:
    * 0.25·min(tokens/100,1) + 0.25·distinct-token ratio +
    * 0.25·(1 − |stopword-ratio − 0.4|) + 0.25·min(meanWordLen/8,1). */
  def qualityScore(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws).cast("double")
    val distinctRatio = size(array_distinct(ws)).cast("double") / n
    val enStop = LangMarkers.head._2
    val stopRatio = size(filter(ws,
      w => enStop.map(m => w === m).reduce(_ || _))).cast("double") / n
    val meanLen = (length(text).cast("double") - (n - 1)) / n
    val score = least(n / 100d, lit(1d)) * 0.25 +
      distinctRatio * 0.25 +
      (lit(1d) - abs(stopRatio - 0.4)) * 0.25 +
      least(meanLen / 8d, lit(1d)) * 0.25
    // null text must score null, not a passing mid-range value:
    // size(null) = -1 makes the ratio terms -1/-1 = 1.0 and
    // null-skipping least() turns the meanLen term into 1.0, summing
    // to ~0.60 — above a typical 0.5 quality cutoff
    when(text.isNull, lit(null).cast("double")).otherwise(score)
  }

  /** Token count (whitespace convention); null text counts null, NOT
    * -1 — `size(null)` is -1 under Spark's default config, which would
    * flow a poisoned -1 into [[packShards]]' prefix sums (every later
    * document's offset shifted down, shard_id = -1 at the boundary)
    * and deflate corpus token totals. In [[prefixSum]] a null value
    * contributes 0 to the running offsets (window/bucket sums skip
    * nulls), so null-text docs still get a well-defined shard. */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int")).otherwise(size(tokens(text)))

  /** Corpus-relative unigram log-probability per document — the
    * "perplexity filter" of training-data curation (docs whose words
    * are atypical for the corpus score low; gibberish and boilerplate
    * both stand out):
    * `mean_log10p = avg(log10(count(w) / total_words))` over the
    * document's words, under the corpus's own unigram model.
    *
    * Plan shape: one exploded word frame feeds (a) the vocab counts —
    * a partial-aggregated groupBy — and (b) an equi-join back on the
    * word; the per-doc rollup partial-aggregates again. The counts
    * side of the join is vocab-sized, so AQE broadcasts it whenever it
    * fits; the one-row total is an explicit broadcast. At web scale
    * the vocab itself is capped top-K with an OOV floor before the
    * join — the model changes, the plan shape does not. */
  def unigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("__w"))
    val counts = words.groupBy(col("__w"))
      .agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum(col("__cnt")).cast("double").as("__total"))
    words.join(counts, "__w")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        round(avg(log10(col("__cnt") / col("__total"))), 6)
          .as("mean_log10p"))
  }

  /** Repetition quality signals per document — the Gopher/C4-style
    * filters a training-data pipeline drops boilerplate and
    * degenerate pages with:
    *
    *  - `dup_word_frac`: 1 − distinct-word ratio (narrow, per row);
    *  - `top_bigram_frac`: occurrences of the most frequent word
    *    bigram over all bigram occurrences;
    *  - `rep_bigram_frac`: fraction of bigram occurrences whose bigram
    *    appears more than once.
    *
    * Plan shape: one narrow projection (words + bigram array), explode,
    * then two hash aggregations — (id, bigram) counts and the per-id
    * rollup — both with map-side partial aggregation; no joins, no
    * windows, so it scales by the bigram-occurrence count. Documents
    * with fewer than two words carry no bigram signal and are absent
    * from the output (the oracle's unnest drops them identically). */
  def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val n = size(col("__ws")).cast("double")
    // bigram pairs via slice + arrays_zip, NOT a transform(sequence)
    // lambda: higher-order functions are CodegenFallback, so the old
    // form ran one interpreted lambda call per bigram occurrence and
    // broke whole-stage codegen for the projection (r21; the same
    // lesson as q32's winnowMd5 kernel). slice lengths clamp at 0 so
    // sub-2-word docs zip to an empty array and explode drops them —
    // the same rows the old size guard dropped. Words contain no
    // whitespace (tokens splits on it), so the joined string is the
    // same bigram key as before.
    val nm1 = greatest(size(col("__ws")) - 1, lit(0))
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol),
        round(lit(1d) - size(array_distinct(col("__ws"))).cast("double") / n,
          6).as("dup_word_frac"),
        explode(arrays_zip(slice(col("__ws"), lit(1), nm1),
          slice(col("__ws"), lit(2), nm1))).as("__bgp"))
      .select(col(idCol), col("dup_word_frac"),
        concat(col("__bgp.0"), lit(" "), col("__bgp.1")).as("bg"))
      .groupBy(col(idCol), col("bg"))
      .agg(first(col("dup_word_frac")).as("dwf"), count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        first(col("dwf")).as("dup_word_frac"),
        round(max(col("cnt")).cast("double") / sum(col("cnt")), 6)
          .as("top_bigram_frac"),
        round(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
          .cast("double") / sum(col("cnt")), 6).as("rep_bigram_frac"))
  }

  /** BPE-style tokenization regex: letter runs, digit runs, and single
    * punctuation marks each count as a token — the usual pre-tokenizer
    * shape of GPT-style vocabularies. Identical semantics in Java regex
    * and RE2, so the oracle can mirror it. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Subword-ish token count under [[BpeTokenPattern]] — a closer LLM
    * cost proxy than whitespace counting (punctuation and number runs
    * tokenize separately). Null text counts null (same `size(null)=-1`
    * guard as [[tokenCount]]). */
  def bpeTokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int"))
      .otherwise(size(regexp_extract_all(text, lit(BpeTokenPattern),
        lit(0))))

  /** Mean token length, computed from char count assuming single spaces. */
  def meanTokenLen(text: Column): Column = {
    val n = size(tokens(text)).cast("double")
    (length(text).cast("double") - (n - 1)) / n
  }

  // ------------------------------------------------- corpus partitioning

  /** Deterministic train/val/test (or any weighted) split assignment:
    * the id hashes into one of `buckets` buckets and cumulative-weight
    * boundaries map buckets to split names. A document's split depends
    * only on its id — stable across runs, partitionings, cluster sizes
    * and engines (the md5-derived [[baseHash]], so an external system
    * or the oracle reproduces the same assignment) — which is the
    * property ad-hoc `rand()` splits lack and training pipelines need
    * (no eval-set leakage when the corpus is re-processed). A narrow
    * per-row expression: no shuffle, no state. */
  def hashSplit(id: Column, weights: Seq[(String, Double)],
      buckets: Int = 1000, fast: Boolean = false): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = baseHash(id.cast("string"), fast) % buckets
    // integer boundaries from cumulative weights; the last split takes
    // any remainder so every bucket is assigned
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(cw => math.round(cw / total * buckets))
    // every split must own >= 1 bucket, or it would silently never
    // receive a row (e.g. weight 0.0003 at buckets=1000 rounds to 0)
    require(bounds.zip(0L +: bounds.init).forall { case (b, prev) => b > prev },
      s"a split rounds to zero of $buckets buckets; raise `buckets` " +
        s"or the weight (bounds=${bounds.mkString(",")})")
    val assigned = weights.init.zip(bounds.init).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), b)) =>
        when(bucket < b, name).otherwise(acc)
      }
    // a null id must yield a null split, not silently land in the last
    // (held-out) split via the when-chain fallthrough. The guard must
    // be on the ID, not the bucket: xxhash64(null) is NOT null (it
    // returns the seed, 42), so the fast path's bucket is non-null for
    // null ids and a bucket-null check alone would assign them
    when(id.isNotNull && bucket.isNotNull, assigned)
  }

  /** Deterministic stratified Bernoulli sampling — the data-mixing
    * primitive of corpus rebalancing ("keep 20% of English, 60% of
    * everything else"): a row is kept iff
    * `pmod(xxhash64(id, seed), 100) < rate(stratum)`. Pure function
    * of (id, stratum, seed): the same row gets the same verdict on
    * any engine, executor count, or run — so a sample drawn today and
    * a sample drawn after a re-shard are IDENTICAL sets (the property
    * `df.sample()` explicitly does not give), and an external engine
    * can reproduce the exact membership (gate q67 replays the xxhash64
    * chain in SQL). Narrow, shuffle-free, scale-independent.
    *
    * Rates are integer percentages (0..100). A stratum absent from
    * `rates` (including a NULL stratum — equality with every listed
    * stratum is null, so the when-chain falls through) samples at
    * `defaultRate`. Null ids are DROPPED explicitly: `xxhash64` skips
    * null children, so all null-id rows would share one hash and be
    * kept or dropped as a block — neither is a defensible sample. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultRate: Int,
      seed: Long = 7L): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 100),
      "rates are integer percentages in 0..100")
    require(rates.map(_._1).distinct.size == rates.size,
      "duplicate stratum in rates")
    val h = pmod(xxhash64(col(idCol), lit(seed)), lit(100L))
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((s, r), acc) => when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.where(col(idCol).isNotNull && h < rate)
  }

  /** Exact per-stratum token-length profile — the corpus audit that
    * sizes a training run (docs, tokens, and EXACT nearest-rank
    * percentiles per source/language/shard): p(q) = the smallest token
    * count whose cumulative doc count reaches ceil(q·n/100).
    *
    * Shape at scale — the histogram method, not a per-stratum row
    * sort: one `groupBy(stratum, tokc)` compresses the corpus to its
    * distinct (stratum, length) pairs (bounded by max doc length, NOT
    * corpus size), the cumulative window then runs over that tiny
    * frame, and percentiles fall out of a conditional min. A
    * row-number approach would sort every row of a 100 TB corpus
    * inside skewed stratum partitions; this sorts a few thousand
    * histogram buckets. Exactness is what makes it oracle-able
    * (gate q70) — approximate sketches can't hash-match an external
    * engine.
    *
    * Docs with a null id or null text are excluded (no defined
    * length); a null STRATUM is a real group (profiled like any
    * other). Token counts ride as longs end to end. */
  def corpusProfile(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, percentiles: Seq[Int] = Seq(50, 90, 99))
      : DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      "percentiles are integers in 1..100")
    require(percentiles.distinct.size == percentiles.size,
      "duplicate percentile")
    val t = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(strataCol).as("stratum"),
        size(split(col(textCol), " ")).cast("long").as("__tokc"))
    val hist = t.groupBy(col("stratum"), col("__tokc"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(col("stratum"))
      .orderBy(col("__tokc").asc)
    val allW = Window.partitionBy(col("stratum"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(allW))
    val pCols = percentiles.map { p =>
      // nearest-rank: ceil(p*n/100) in EXACT integer arithmetic —
      // `div` is integral division; the tempting `floor((x)/100)` is
      // DOUBLE division, which can land one off from the oracle's
      // BIGINT `//` once p·n approaches 2^53
      val rank = expr(s"(__n * $p + 99) div 100")
      min(when(col("__cum") >= rank, col("__tokc"))).as(s"p${p}_tokens")
    }
    val aggs = Seq(
      max(col("__n")).as("n_docs"),
      sum(col("__tokc") * col("__c")).as("sum_tokens"),
      min(col("__tokc")).as("min_tokens"),
      max(col("__tokc")).as("max_tokens")) ++ pCols
    cum.groupBy(col("stratum")).agg(aggs.head, aggs.tail: _*)
  }

  /** Leakage-safe split assignment: near-duplicate clusters are
    * assigned to train/val/test as UNITS. A document's split is
    * [[hashSplit]] of its CLUSTER label (component min id from
    * [[dedupClustersStar]] over `pairs`; unpaired docs label
    * themselves), so two near-duplicates can never straddle train and
    * eval — the leakage channel a per-document split leaves open.
    * Deterministic end to end: same pairs → same clusters → same
    * splits, across runs and engines.
    *
    * @return (idCol, cluster_id, split) for every row of `docs`
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
      weights: Seq[(String, Double)], buckets: Int = 1000,
      fast: Boolean = false, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // maxIter/checkpointDir reach the contraction loop so a production
    // run can enable reliable checkpointing without bypassing this API
    val labels = dedupClustersStar(pairs, maxIter = maxIter,
        checkpointDir = checkpointDir)
      .withColumnRenamed("doc_id", idCol)
    docs.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        hashSplit(col("cluster_id"), weights, buckets, fast))
  }

  /** Exact EXCLUSIVE prefix sum of `valueCol` in `orderCol` order,
    * without the single-partition global window (`Window.orderBy` with
    * no partition key — the canonical Spark scale anti-pattern this
    * method exists to avoid).
    *
    * Two-pass distributed scan: literal range bounds (one
    * `approxQuantile` job) split the order domain into `buckets`
    * roughly-equal key ranges; the bucket is then a PURE FUNCTION of
    * the row, so the totals job and the output job cannot disagree on
    * placement (the trap with `repartitionByRange` +
    * `spark_partition_id`, whose sampled boundaries may differ between
    * jobs on an uncached frame). Per-bucket totals — at most `buckets`
    * rows — come back to the driver, their running sum becomes a
    * literal offset array, and the output job adds the offset to a
    * per-bucket window scan. Each window partition holds ~1/buckets of
    * the data: no global sort, no driver data path beyond the bounded
    * totals row set.
    *
    * Rows with a null `orderCol` are excluded (a total order cannot
    * place them). `orderCol` values must be distinct (document ids) —
    * ties would make "exclusive" ambiguous.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 32): DataFrame = {
    val base = df.where(col(orderCol).isNotNull)
    // interior quantile bounds; distinct guards collapsed ranges when
    // the key domain is tiny relative to `buckets`
    val bounds = base.stat
      .approxQuantile(orderCol,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted
    // bucket = count of bounds <= key, binary-searched in one
    // codegen'd kernel call ([[graft.functions.VectorFunctions
    // .SortedBucket]] — value-parity with the interpreted
    // size(filter(boundsLit, b => key >= b)) HOF it replaces,
    // spec-pinned); the double cast mirrors the old comparison's
    // implicit numeric promotion against double literals
    val bucketOf = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.VectorFunctions.SortedBucket(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          col(orderCol).cast("double")), bounds.toSeq))
    val bk = Iterator.from(0).map(i => s"__graft_bk$i")
      .find(n => !df.columns.contains(n)).get
    val bucketed = base.withColumn(bk, bucketOf)
    // coalesce: a bucket whose every value is null sums to NULL. The
    // explicit long cast makes the driver-side getLong total valid for
    // any integral valueCol width (sum() widens int->long anyway); a
    // fractional valueCol is a contract violation (token budgets are
    // integral) and now fails loudly at analysis instead of as a
    // runtime ClassCastException on the collected row
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
        .contains(df.schema(valueCol).dataType),
      s"prefixSum requires an integral $valueCol, got " +
        df.schema(valueCol).dataType.simpleString)
    val totals = bucketed.groupBy(col(bk))
      .agg(coalesce(sum(col(valueCol)).cast("long"), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 to bounds.length).scanLeft(0L) {
      case (acc, b) => acc + totals.getOrElse(b, 0L)
    }
    val offsetOf = element_at(
      array(offsets.map(lit).toIndexedSeq: _*), col(bk) + 1)
    val w = Window.partitionBy(col(bk)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn(outCol,
        coalesce(sum(col(valueCol)).over(w), lit(0L)) + offsetOf)
      .drop(bk)
  }

  /** Token-budget shard packing: assign each document to a training
    * shard of ~`budget` tokens by fixed token offsets — shard =
    * floor(exclusive-prefix-sum(tokens) / budget) in `orderCol` order,
    * the deterministic sharding a dataloader can reproduce. Built on
    * [[prefixSum]], so no global-sort bottleneck. Adds `n_tokens`,
    * `tok_offset` and `shard_id`. */
  def packShards(docs: DataFrame, orderCol: String, textCol: String,
      budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counted = docs.withColumn("n_tokens",
      tokenCount(col(textCol)).cast("long"))
    prefixSum(counted, orderCol, "n_tokens", "tok_offset", buckets)
      .withColumn("shard_id",
        floor(col("tok_offset") / lit(budget)).cast("long"))
  }

  /** Per-key quota: keep at most `n` rows per `keyCol`, preferring the
    * smallest `orderCol` (deterministic, so re-runs keep the same rows).
    * The canonical curation cap ("at most N documents per domain").
    * One shuffle on the key with a rank window; at 100 TB hot keys are
    * plain window partitions — bound the damage by capping upstream
    * (this operator IS that cap) and let AQE handle residual skew. */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String,
      n: Int): DataFrame = {
    // collision-proof temp name: never clobber a caller column
    val rk = Iterator.from(0).map(i => s"__graft_rk$i")
      .find(name => !df.columns.contains(name)).get
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= n)
      .drop(rk)
  }

  /** Temperature-based domain rebalancing — the data-mixing operator
    * that downsamples over-represented domains so a multi-domain
    * corpus approaches `p_k ∝ n_k^alpha` (multilingual-sampling
    * convention, `alpha < 1` flattens the distribution). Realized as
    * deterministic per-row acceptance: key `k` keeps a row iff
    * `md5-bucket(id) < floor((n_min / n_k)^(1-alpha) · buckets)`, so
    * the smallest domain keeps everything and a domain 4× its size
    * keeps half of itself at `alpha = 0.5`. The hash acceptance is a
    * pure function of the id — stable across runs, partitionings and
    * engines (no `rand()`), re-runs keep the SAME rows.
    *
    * `alpha = 0.5` uses `sqrt` (IEEE correctly-rounded, so an external
    * SQL oracle reproduces the thresholds bit-for-bit); other alphas
    * go through `pow`, whose last-bit rounding is libm-dependent —
    * fine in production, not oracle-exact.
    *
    * Plan shape: one partial-aggregated count per key (a key-cardinality
    * frame), the one-row min folded in by cross-joining its broadcast,
    * and the rates rejoined to the corpus via broadcast — the big side
    * is scanned once for counts and once for the filter, with no
    * shuffle of the corpus itself.
    *
    * @return `df` rows that survive, plus a `keep_threshold` column
    *         (the key's acceptance bound in [0, buckets])
    */
  def temperatureSample(df: DataFrame, keyCol: String, idCol: String,
      alpha: Double = 0.5, buckets: Int = 1000000,
      fast: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col(keyCol),
        floor(rate * buckets).cast("long").as("keep_threshold"))
    // explicit id guard: with fast=true, xxhash64(null) is the seed
    // (42), so every null-id row would share one bucket and be kept or
    // dropped as a block; the md5 path nulls out — make both drop
    df.join(broadcast(thresholds), Seq(keyCol))
      .where(col(idCol).isNotNull &&
        baseHash(col(idCol).cast("string"), fast) % buckets
          < col("keep_threshold"))
  }

  // ----------------------------------------------------- PII redaction

  /** PII patterns, written to the common subset of Java regex and RE2
    * (no lookaround, no backreferences) so external engines — and the
    * oracle — match byte-identically. Deliberately high-recall
    * curation patterns, not validators (e.g. the IPv4 arm accepts
    * out-of-range octets, as scrubbing pipelines do). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+\\d{1,3}-\\d{3}-\\d{3,4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count of pattern matches in `text` (non-overlapping, left to
    * right — the semantics every regex engine shares). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redacted text: emails → `[EMAIL]`, then phones → `[PHONE]`, then
    * IPv4s → `[IP]`. Email first (its local part may contain digits
    * and dots an IP arm would chew on); the replacement tokens contain
    * no digits or `@`, so later passes cannot re-match earlier
    * redactions. A narrow codegen'd projection — the 100 TB shape for
    * a scrubbing pass is exactly this: no shuffle, no state. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")

  // ------------------------------------------------- paragraph dedup

  /** Fixed-size word-window "paragraphs": the token array in `words`-
    * sized chunks (the tail chunk keeps whatever remains). Documents
    * need no explicit paragraph markers — dedup granularity becomes a
    * tunable — and the construction is pure array arithmetic, exactly
    * reproducible by any engine with list slicing. */
  def paragraphs(text: Column, words: Int): Column = {
    require(words > 0, "paragraph size must be positive")
    // null text → null array (posexplodes to no rows) — without it,
    // null-text docs would get empty-string "paragraphs" and count as
    // duplicates of each other in paragraphDedup. Codegen'd kernel,
    // same rationale and parity pinning as [[shingles]].
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.TextFunctions.WordParagraphs(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text), words))
  }

  /** Overlapping sliding-window chunking — the training-data / RAG
    * passage builder: one output row per window of `chunkWords`
    * whitespace tokens, a new window starting every `strideWords`
    * (stride < chunk ⇒ overlapping context windows; stride == chunk ⇒
    * [[paragraphs]]-style disjoint chunks, row-per-chunk instead of
    * array-per-doc). Windows start at token offsets 0, stride,
    * 2·stride, … while the offset is inside the document, so a tail
    * shorter than `chunkWords` is kept (truncation is the consumer's
    * policy decision, not the chunker's) and a document shorter than
    * one chunk yields exactly one chunk. Null-text documents yield no
    * rows. Output: (id, `chunk_index` 0-based, `chunk_text`,
    * `chunk_words`).
    *
    * Scale shape: pure narrow array arithmetic — `split` +
    * `posexplode(sequence)` + `slice`, all codegen'd; no UDF, no
    * shuffle anywhere. 100 TB cost is output-proportional (the
    * overlap factor chunk/stride is the only amplification), and the
    * rows stay co-partitioned with their source document for free. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be > 0, got $chunkWords")
    require(strideWords > 0 && strideWords <= chunkWords,
      s"strideWords must be in [1, chunkWords], got $strideWords")
    val chunk = slice(col("__w"), col("__off") + 1, lit(chunkWords))
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1,
          lit(strideWords))).as(Seq("__ci", "__off")))
      .select(col(idCol), col("__ci").cast("long").as("chunk_index"),
        array_join(chunk, " ").as("chunk_text"),
        size(chunk).cast("long").as("chunk_words"))
  }

  /** Paragraph-level exact dedup bookkeeping — the passage-granularity
    * companion to [[exactDedup]] (whole documents) that catches
    * boilerplate shared ACROSS distinct pages (headers, licence
    * blocks, templated intros). A paragraph occurrence is KEPT iff it
    * is the first occurrence of its content in (id, position) order —
    * the deterministic "keep the earliest copy" rule — and every later
    * occurrence, across documents or within one, is a duplicate.
    *
    * Plan shape: posexplode the paragraph array, md5 each paragraph,
    * one `groupBy(hash)` whose `min(struct(id, pos))` partially
    * aggregates map-side (the shuffle carries one row per distinct
    * paragraph per map partition, not per occurrence), broadcast-free
    * equi-join back on the hash, then a per-document rollup. No
    * windows, no all-pairs anything: cost scales with occurrence
    * count, the 100 TB shape.
    *
    * @param parasCol array-of-strings column (e.g. [[paragraphs]])
    * @return one row per document: `n_paras`, `n_kept`, `n_dup`
    */
  def paragraphDedup(docs: DataFrame, idCol: String,
      parasCol: String): DataFrame = {
    val occ = docs
      .select(col(idCol), posexplode(col(parasCol)).as(Seq("__pos", "__p")))
      .select(col(idCol), col("__pos"), md5(col("__p")).as("__h"))
    val firsts = occ.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
    occ.join(firsts, "__h")
      .withColumn("__kept",
        (col("__first")(idCol) === col(idCol) &&
          col("__first")("__pos") === col("__pos")).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras"),
        sum(col("__kept")).as("n_kept"),
        (count(lit(1)) - sum(col("__kept"))).as("n_dup"))
  }
}
