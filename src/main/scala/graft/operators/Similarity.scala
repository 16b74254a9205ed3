package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: LSH-style
  * sign-bucket partitioning — vectors only compared within their bucket, so
  * the cross product shrinks by ~2^bits and the join is a bucket equi-join
  * that shuffles instead of broadcasting the full corpus.
  *
  * All vector math accumulates left-to-right in doubles — reproducible
  * across engines for the oracle. The kernels are custom codegen'd
  * expressions ([[graft.functions.VectorFunctions]]): the
  * `aggregate`/`zip_with` higher-order formulations they replaced are
  * `CodegenFallback` (interpreted, boxing every element per candidate
  * pair), which dominated the rerank and band-assignment hot paths.
  */
object Similarity {

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = org.apache.spark.sql.graftshim.ColumnShim.column(e)
  private def exprOf(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftshim.ColumnShim.expression(c)

  /** Σ aᵢ·bᵢ in double precision (left-to-right; null element or
    * length mismatch → null — the `aggregate(zip_with(...))`
    * semantics, now one codegen'd kernel call). */
  def dot(a: Column, b: Column): Column =
    colOf(graft.functions.VectorFunctions.VecDot(exprOf(a), exprOf(b)))

  /** Euclidean norm in double precision. */
  def norm(a: Column): Column =
    sqrt(colOf(graft.functions.VectorFunctions.VecNormSq(exprOf(a))))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane-style LSH bucket from the signs of the first `bits`
    * dimensions (axis-aligned planes — deterministic, engine-portable and
    * trivially SQL-mirrorable for the oracle; biased when dimensions are
    * correlated — [[hyperplaneBucket]] is the production variant).
    *
    * @note SUPERSEDED BASELINE — kept for the oracle gates (q28/q29) and
    *       as the teaching-simple variant. New code should key on
    *       [[bandKeys]] (banded, content-derived cardinality) instead:
    *       a single `bits`-wide bucket caps the join's parallelism at
    *       2^bits and grows near-quadratically within buckets at scale. */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits)
      .map(i => when(element_at(vec, i + 1) > 0f, 1L << i).otherwise(0L))
      .reduce(_ + _)

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Integer-quantized deterministic pseudo-random hyperplanes, entries
    * uniform in [-512, 511] from a splitmix64 stream of `seed`, generated
    * at plan time — identical on every executor and every run. Signs are
    * scale-free, so quantization does not change the LSH family, and
    * integer entries print exactly as SQL literals, so an external oracle
    * can rebuild the identical planes and reproduce every dot product
    * bit-for-bit. */
  def intPlanes(seed: Long, bits: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(bits, dim) { (i, j) =>
      (splitmix64(seed + i.toLong * 1000003L + j.toLong) >>> 54) - 512L
    }

  /** Seeded random-hyperplane LSH bucket: bit i = sign(v · plane_i).
    * Unlike [[signBucket]], unbiased under correlated dimensions — the
    * classic SimHash-for-vectors scheme. The planes enter the plan as
    * literal arrays, so the expression stays codegen'd built-ins with no
    * UDF and no runtime randomness. */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int = 8,
      seed: Long = 42L): Column =
    colOf(graft.functions.VectorFunctions.PlaneSignBits(exprOf(vec),
      intPlanes(seed, bits, dim).map(_.map(_.toDouble).toSeq).toSeq))

  /** One `bitsPerBand`-bit [[hyperplaneBucket]]-family key per band, each
    * band seeded independently — the vector-space analogue of the minhash
    * band construction in `TextOps.lshCandidatePairs`. Two vectors are
    * candidates when ANY band key collides, so recall is
    * 1-(1-p^bits)^bands while each band key keeps full content-derived
    * cardinality (2^bits values per band — no capped bucket count).
    *
    * The band's planes ride the expression as ONE matrix constant
    * consumed by a single codegen'd kernel loop
    * ([[graft.functions.VectorFunctions.PlaneSignBits]]), not `bits`
    * separate dot-product subtrees: the unrolled form (r5) produced a
    * 4096-term expression whose first-use analysis+codegen took ~1
    * minute, and the r13 `transform`+`zip_with`+`aggregate` matrix form
    * — though constant-size — was `CodegenFallback`, evaluating
    * bands×bits×dim interpreted lambdas per row. Values are identical
    * (same per-plane left-to-right double aggregation, same integer
    * weights, null/wrong-length vector → bit 0, null vector → key 0). */
  def bandKeys(vec: Column, dim: Int, bands: Int, bitsPerBand: Int,
      seed: Long = 42L): Seq[Column] =
    (0 until bands).map { b =>
      colOf(graft.functions.VectorFunctions.PlaneSignBits(exprOf(vec),
        intPlanes(seed + 7919L * b, bitsPerBand, dim)
          .map(_.map(_.toDouble).toSeq).toSeq))
    }

  /** Deterministic near-identity multipliers 1 + k/512 with k ∈ [-10, 10]
    * (dyadic, so the decimal print is the exact double). Multiplying a
    * vector elementwise keeps cosine ≈ 0.9996 — used to plant recoverable
    * near-duplicates for ANN validation. */
  def perturbMultipliers(seed: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      val k = java.lang.Math.floorMod(splitmix64(seed + j) >>> 40, 21L) - 10L
      1.0 + k.toDouble / 512.0
    }

  /** Banded-LSH approximate top-k — the 100 TB scale path. Candidate
    * generation is a (band, key) equi-join unioned over bands (one shuffle
    * on content-derived 2^bitsPerBand-cardinality keys, AQE-splittable),
    * followed by an exact cosine rerank restricted to the candidates.
    * Contrast with [[bucketedTopK]], whose single bucket column caps the
    * partition count at 2^bits and so grows near-quadratically per bucket
    * as the corpus scales. */
  def bandedTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, bands: Int = 4,
      bitsPerBand: Int = 16, seed: Long = 42L): DataFrame = {
    // wrong-length vectors are dropped like zero/NaN-norm ones: their
    // zip_with against the hyperplanes pads with nulls, every band bit
    // collapses to 0, and ALL such vectors would collide on key 0 in
    // every band — an all-pairs clique feeding null sims into rerank
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
      .where(size(col("__qv")) === dim)
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
      .where(size(col("__cv")) === dim)
    val cand = bandKeyed(q, "query_id", "__qv", dim, bands, bitsPerBand,
        seed)
      .join(bandKeyed(c, "cand_id", "__cv", dim, bands, bitsPerBand,
        seed), Seq("band", "key"))
      .select("query_id", "cand_id").distinct()
    rerank(cand.join(q, "query_id").join(c, "cand_id"), k)
  }

  /** The (id, band, key) posexplode projection shared by the banded
    * search ([[bandedTopK]]) and banded dedup
    * ([[bandedNearDupPairsNormed]]) paths — one definition so the band
    * encoding can never drift between them. */
  private def bandKeyed(df: DataFrame, id: String, vec: String, dim: Int,
      bands: Int, bitsPerBand: Int, seed: Long): DataFrame =
    df.select(col(id),
      posexplode(array(bandKeys(col(vec), dim, bands, bitsPerBand,
        seed): _*)).as(Seq("band", "key")))

  /** Shared (id, vec, norm) projection for every search/dedup operator,
    * DROPPING zero-norm, NaN, INFINITE and null vectors: a zero vector
    * has no direction, and a NaN cosine would rank FIRST under Spark's
    * NaN-is-greatest ordering (and pass every `>= threshold` compare) —
    * polluting every top-k with junk rather than merely wasting work.
    * The NaN check must be explicit (`NaN > 0.0` is TRUE in Spark), and
    * so must the Infinity bound: an Inf-element vector has norm Inf,
    * which passes `> 0` and `!isnan` but yields Inf/Inf = NaN sims —
    * the same pollution through the back door. */
  private def normed(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, nAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        norm(col(vecCol)).as(nAs))
      // the id filter is load-bearing too: rerank partitions its top-k
      // window by query_id, so two DISTINCT null-id queries would merge
      // into one null partition and share a single top-k between them
      .where(col(idAs).isNotNull &&
        col(nAs) > 0.0 && !isnan(col(nAs)) &&
        col(nAs) < Double.PositiveInfinity)

  /** Shared exact-cosine rerank tail: compute sims over candidate
    * pairs carrying (__qv,__qn) / (__cv,__cn), keep each query's top-k
    * by similarity (ties to the lower cand_id). One definition for the
    * four search variants, so tie-breaking and output shape can never
    * drift. */
  private def rerank(pairs: DataFrame, k: Int): DataFrame = {
    val scored = pairs.withColumn("sim",
      dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** The deterministic coarse quantizer, materialized: the `nCells`
    * lowest-id corpus vectors (not `id < nCells`, which silently yields
    * no centroids on non-dense id spaces), collected once on the driver
    * and folded into ONE literal array of (cell_id, cent, centn)
    * structs. This is quantizer *metadata* — a few KB, the same
    * driver-side materialization a trained k-means quantizer performs —
    * never the corpus. None when the corpus is empty.
    *
    * Two representation choices matter at production scale: the id
    * keeps its ORIGINAL type (any orderable id — string doc ids
    * included — works, as the r7 broadcast shape did), and the whole
    * matrix is one `Literal.create` of pre-converted data rather than a
    * per-element `lit()` tree — 4096 cells × 768 dims as expression
    * nodes would be ~3M analyzer-visible nodes and a plan-size cliff;
    * as a single Literal it is O(1) plan nodes regardless of size. */
  private[graft] def centroidLiteral(candidates: DataFrame, idCol: String,
      vecCol: String, nCells: Int, dim: Option[Int] = None)
      : Option[Column] = {
    val rows = centroidRows(candidates, idCol, vecCol, nCells, dim)
    if (rows.isEmpty) None
    else Some(centsLiteralOf(rows, candidates.schema(idCol).dataType))
  }

  /** The (cell_id, cent, centn) quantizer literal from already-
    * collected [[centroidRows]] — shared so the residual path can
    * build the literal AND read the centroid ids from ONE collect. */
  private def centsLiteralOf(rows: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val structType = StructType(Seq(
      StructField("cell_id", idType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("centn", DoubleType, nullable = false)))
    val value = rows.toIndexedSeq.map(r =>
      org.apache.spark.sql.Row(r.get(0), r.getSeq[Double](1),
        r.getDouble(2)))
    org.apache.spark.sql.graftshim.ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        value, ArrayType(structType, containsNull = false)))
  }

  /** The quantizer row selection behind [[centroidLiteral]], exposed so
    * the residual-IVFADC path can map each cell_id to its QUANTIZED
    * centroid via the same deterministic pick. Returns (cell_id, cent
    * as array<double>, centn) rows. */
  private def centroidRows(candidates: DataFrame, idCol: String,
      vecCol: String, nCells: Int, dim: Option[Int])
      : Array[org.apache.spark.sql.Row] = {
    candidates
      .select(col(idCol).as("cell_id"),
        col(vecCol).cast("array<double>").as("__cent"),
        norm(col(vecCol)).as("__centn"))
      // a wrong-length vector must not become a centroid either: the
      // assignment filter derives the expected length from the FIRST
      // centroid when `dim` is not given, so a short/long low-id
      // vector in the quantizer would invert that filter and drop the
      // entire well-formed corpus instead of the malformed row
      .where(dim.map(d => size(col("__cent")) === d).getOrElse(lit(true)))
      // null ids sort FIRST ascending and a zero/NaN/INFINITE-norm
      // centroid poisons every cosine against it (Inf/Inf = NaN, and
      // NaN ranks greatest, so one Inf-element centroid would win every
      // assignCells comparison and collapse the whole corpus into its
      // cell) — none may enter the quantizer. Same three-part bound as
      // [[normed]], whose doc calls it load-bearing.
      .where(col("cell_id").isNotNull &&
        col("__centn") > 0.0 && !isnan(col("__centn")) &&
        col("__centn") < Double.PositiveInfinity)
      .orderBy(col("cell_id").asc)
      .limit(nCells)
      .collect()
  }

  /** Adds a `cell_id` column: each row's `keep` best cells by
    * (cosine desc, cell_id asc) against the literal centroids — a pure
    * narrow projection (no join, no window, no shuffle; plan-pinned in
    * `PlanAuditSpec`).
    *
    * The argmax itself is ONE codegen'd kernel call
    * ([[graft.functions.VectorFunctions.CellTopK]] — value-parity with
    * the r13 `transform`-scores + fold/`array_sort` HOF tree, which
    * evaluated nCells interpreted dot-lambdas per row and would have
    * been nCells×dim lambda dispatches per row at a production 4096-
    * cell quantizer). The kernel ranks centroid INDICES (centroids
    * ride in ascending-cell_id order, so index order == the HOF
    * tie-break order); the id column keeps its original type via an
    * `element_at` into the same literal the scores used to traverse. */
  private[graft] def assignCells(df: DataFrame, cents: Column, vec: String,
      n: String, keep: Int): DataFrame = {
    // destructure the literal quantizer back into plan-time matrices
    val centsLit = org.apache.spark.sql.graftshim.ColumnShim
      .expression(cents)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
    val arr = centsLit.value
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nCells = arr.numElements()
    val centMat = (0 until nCells)
      .map(i => arr.getStruct(i, 3).getArray(1).toDoubleArray().toSeq)
    val centNs = (0 until nCells).map(i => arr.getStruct(i, 3).getDouble(2))
    val topIdx = colOf(graft.functions.VectorFunctions.CellTopK(
      exprOf(col(vec)), exprOf(col(n)), centMat, centNs, keep))
    if (keep == 1)
      df.withColumn("cell_id",
        element_at(cents, element_at(topIdx, 1) + 1)("cell_id"))
    else {
      // explode the index array (sorted best-first), then map each
      // index through the literal — no per-row HOF left
      val ci = Iterator.from(0).map(i => s"__graft_ci$i")
        .find(n => !df.columns.contains(n)).get
      df.withColumn(ci, explode(topIdx))
        .withColumn("cell_id", element_at(cents, col(ci) + 1)("cell_id"))
        .drop(ci)
    }
  }

  /** IVF-style ANN — the inverted-file counterpart to [[bandedTopK]].
    * A coarse quantizer assigns every corpus vector to its best-cosine
    * cell; a query probes its `nProbe` closest cells and reranks
    * exactly within their populations. The cell id is a shuffle key
    * like an LSH band key, but cells follow the data distribution (no
    * empty hash buckets) and recall/cost is tuned per query via
    * `nProbe` with no index rebuild.
    *
    * The quantizer here is deterministic — the `nCells` lowest-id
    * corpus vectors act as centroids — which keeps the whole operator
    * bit-mirrorable by an external SQL oracle (gate q41); a trained
    * k-means quantizer drops in by swapping [[centroidLiteral]].
    * Assignment is join-free: the centroids ride the plan as one
    * literal matrix and each row computes its own argmax in a narrow
    * pass ([[assignCells]]) — at 100 TB the only shuffle is the
    * cell-key join plus the per-query top-k window. (The r7 shape —
    * crossJoin(broadcast(cents)) + row_number window — blew the corpus
    * up nCells× and shuffled the blown-up frame just to pick each
    * row's argmin; at production cell counts that dominates the job.) */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 8,
      nProbe: Int = 2, dim: Option[Int] = None,
      excludeSelf: Boolean = false): DataFrame = {
    // a zero nCells would silently take the empty-corpus branch below
    // and return "no neighbors" for a populated corpus
    require(nCells > 0 && nProbe > 0, "nCells and nProbe must be > 0")
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    centroidLiteral(candidates, idCol, vecCol, nCells, dim) match {
      case None => // empty corpus: empty result, correct schema
        rerank(q.crossJoin(c).where(lit(false)), k)
      case Some(cents) => ivfSearch(q, c, cents, k, nProbe, excludeSelf)
    }
  }

  /** Assignment + probe + rerank over an arbitrary quantizer literal
    * (the cell_id/cent/centn struct-array shape both
    * [[centroidLiteral]] and [[ivfTopKTrained]] build).
    * `excludeSelf` drops query==candidate pairs BEFORE ranking (the
    * self-neighbor is otherwise always rank 1 when queries come from
    * the corpus itself) — the filter must precede the rank window, or
    * a query tied with exact duplicates could return k-1 rows. */
  private def ivfSearch(q: DataFrame, c: DataFrame, cents: Column,
      k: Int, nProbe: Int, excludeSelf: Boolean = false): DataFrame = {
    // length-vs-quantizer check (the centroid dim is a literal, so
    // the comparison constant-folds): a wrong-length vector's
    // cosine against every centroid is null, the assignment fold
    // would silently stick it to the first cell, and its null sims
    // would still receive row_number ranks in rerank
    val centDim = size(element_at(cents, 1)("cent"))
    val assignedC = assignCells(c.where(size(col("__cv")) === centDim),
      cents, "__cv", "__cn", keep = 1)
    val probedQ = assignCells(q.where(size(col("__qv")) === centDim),
      cents, "__qv", "__qn", keep = nProbe)
    val pairs = probedQ.join(assignedC, "cell_id")
    rerank(if (excludeSelf) pairs.where(col("query_id") =!= col("cand_id"))
      else pairs, k)
  }

  /** Deterministic fixed-point Lloyd k-means over an embedding column —
    * the trained counterpart to [[ivfTopK]]'s seed quantizer (its output
    * drops into [[centroidLiteral]]'s role) and the clustering step of
    * corpus diversity analysis / data-mixing pipelines.
    *
    * Determinism is the design constraint: float k-means depends on
    * partition-order-sensitive double sums, so two runs (or two engines)
    * disagree in the last bit and assignments flip. Here every vector is
    * quantized once to `floor(x · scale)` longs, distances are squared-L2
    * sums of longs (exact, order-independent), and centroid updates are
    * exact integer floor-division of long sums — bit-identical on any
    * engine, which is how the q53 oracle replays the whole loop in SQL.
    * Bounds: |x·scale| ≤ ~2^21 for unit-scale embeddings at the default
    * `scale`, so a 64-dim squared distance stays ≤ ~2^47 — far from Long
    * overflow; the sums job holds one Long per (cell, dim) per map
    * partition.
    *
    * Plan shape per iteration (the MLlib shape, expressed relationally):
    * centroids ride the plan as ONE literal matrix (O(1) plan nodes via
    * `Literal.create`, same as [[centroidLiteral]]), each row computes
    * its own argmin in a narrow codegen-friendly pass — no join, no
    * window, no shuffle for assignment — and the update is a posexplode +
    * `groupBy(cell, dim)` whose partial aggregation shuffles k·dim rows
    * per map partition. The k·dim sums return to the driver (quantizer
    * metadata, a few KB), never the corpus. Empty cells keep their
    * previous centroid.
    *
    * Init: by default the k lowest-id vectors (deterministic, the
    * variant the q53 oracle mirrors bit-for-bit). `initSeed =
    * Some(seed)` switches to a deterministic seeded SAMPLE — the k
    * vectors with the smallest `xxhash64(id, seed)` — which spreads the
    * seeds uniformly over the corpus regardless of id layout (lowest-id
    * init degenerates when ids correlate with content, e.g. time-ordered
    * ingestion). Both inits are pure functions of the data, so results
    * reproduce across runs and executor counts; the loop is identical.
    *
    * @return per-cell summary: `cell_id` (0-based, init-id order),
    *         `n_vectors`, `sum_dist` (scaled squared-L2 total — the
    *         quantization error), `cent_sum` (centroid component sum — a
    *         portable centroid checksum)
    */
  def kmeansFixedPoint(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, scale: Long = 1000000L,
      initSeed: Option[Long] = None): DataFrame = {
    require(k > 0 && iters >= 0 && dim > 0 && scale > 0,
      "k, iters, dim, scale must be positive")
    val base = kmeansBase(df, idCol, vecCol, dim, scale)
    val cents = trainCentroids(base, k, iters, initSeed)
    if (cents.isEmpty)
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), kmeansSchema)
    kmeansAssign(base, cents).groupBy(col("__cell"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("__dist")).as("sum_dist"))
      .select(col("__cell").cast("long").as("cell_id"),
        col("n_vectors"),
        col("sum_dist"),
        element_at(
          array(cents.map(c => lit(c._2.sum)).toIndexedSeq: _*),
          col("__cell") + 1).as("cent_sum"))
  }

  /** The quantized, finite-filtered (id, vector) projection the k-means
    * loop runs over. Both per-row passes are codegen'd kernels
    * (value-parity with the transform/exists HOF forms they replaced,
    * spec-pinned). NaN/Inf/null-element vectors are dropped like the
    * search paths do (Similarity.normed): a NaN element quantizes to a
    * null long, the distance argmin falls through to cell 0, and the
    * update step's count/sum disagree on the row — cell 0's centroid
    * would silently drift toward zero. */
  private[graft] def kmeansBase(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, scale: Long): DataFrame = {
    val quantized = colOf(graft.functions.VectorFunctions.QuantizeFloor(
      exprOf(col(vecCol)), scale))
    val finite = colOf(graft.functions.VectorFunctions.AllFinite(
      exprOf(col(vecCol))))
    df.where(col(idCol).isNotNull && size(col(vecCol)) === dim && finite)
      .select(col(idCol).as("__id"), quantized.as("__qv"))
  }

  /** Narrow per-row argmin against the centroid matrix (ties to the
    * lower cell id == lower index — cents ride in cell order): ONE
    * codegen'd kernel call per row
    * ([[graft.functions.VectorFunctions.CellArgMinL2]], value-parity
    * with the r13 transform-scores + fold + array_min HOF tree — the
    * fold's sticky-null seed and array_min's skip-null dist both
    * preserved) instead of k interpreted distance lambdas + 2 folds. */
  private def kmeansAssign(base: DataFrame,
      cents: IndexedSeq[(Int, IndexedSeq[Long])]): DataFrame = {
    val kern = colOf(graft.functions.VectorFunctions.CellArgMinL2(
      exprOf(col("__qv")), cents.map(_._2.toSeq)))
    base.withColumn("__t", kern)
      .withColumn("__cell", col("__t")("cell"))
      .withColumn("__dist", col("__t")("dist"))
      .drop("__t")
  }

  /** The Lloyd training loop over a [[kmeansBase]] projection: k seed
    * centroids (lowest-id, or smallest seeded xxhash64 draw), `iters`
    * exact integer update rounds — empty cells keep their previous
    * centroid. Returns the trained QUANTIZED centroids in cell order
    * (empty when the corpus is). Shared by [[kmeansFixedPoint]] (whose
    * q53/q55 oracles replay this loop bit-exactly in SQL) and
    * [[ivfTopKTrained]] (which uses the result as its coarse
    * quantizer). */
  private[graft] def trainCentroids(base: DataFrame, k: Int, iters: Int,
      initSeed: Option[Long]): IndexedSeq[(Int, IndexedSeq[Long])] = {
    // init: k seed vectors numbered 0..k-1 in draw order. Either way
    // the pick is a TakeOrderedAndProject (top-k, no global sort) and
    // only k rows reach the driver — quantizer metadata, not data.
    val initRows = (initSeed match {
      case Some(seed) => base.orderBy(
        xxhash64(col("__id"), lit(seed)).asc, col("__id").asc)
      case None => base.orderBy(col("__id").asc)
    }).limit(k)
    var cents: IndexedSeq[(Int, IndexedSeq[Long])] = initRows
      .collect().toIndexedSeq
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1).toIndexedSeq }
    if (cents.isEmpty) return cents
    for (_ <- 1 to iters) {
      val sums = kmeansAssign(base, cents)
        .select(col("__cell"), posexplode(col("__qv"))
          .as(Seq("__pos", "__x")))
        .groupBy(col("__cell"), col("__pos"))
        .agg(sum(col("__x")).as("__sum"), count(lit(1)).as("__cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3)))
        .toMap
      cents = cents.map { case (c, prev) =>
        c -> prev.indices.map { j =>
          sums.get((c, j)) match {
            case Some((s, n)) => Math.floorDiv(s, n)
            case None         => prev(j) // empty cell keeps its centroid
          }
        }
      }
    }
    cents
  }

  /** IVF ANN with a TRAINED coarse quantizer: the
    * [[trainCentroids]] Lloyd loop (same fixed-point arithmetic the
    * q53 oracle replays) produces the centroids, which then drop into
    * [[ivfTopK]]'s assignment/probe/rerank exactly as its scaladoc
    * promises. Centroids de-quantize as cent/scale — a single
    * correctly-rounded IEEE division per component, and the norms are
    * left-to-right double sums, so an external SQL oracle reproduces
    * the quantizer, every cosine, and every tie bit-for-bit (gate
    * q65). Cell ids are the 0-based training cell indices. */
  def ivfTopKTrained(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, kCells: Int, iters: Int,
      nProbe: Int, dim: Int, scale: Long = 1000000L,
      initSeed: Option[Long] = None): DataFrame = {
    require(kCells > 0 && iters >= 0 && nProbe > 0 && dim > 0 &&
      scale > 0, "kCells, iters, nProbe, dim, scale must be positive")
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    val cents = trainCentroids(
      kmeansBase(candidates, idCol, vecCol, dim, scale), kCells, iters,
      initSeed)
    if (cents.isEmpty) // empty corpus: empty result, correct schema
      return rerank(q.crossJoin(c).where(lit(false)), k)
    ivfSearch(q, c, trainedCentsLiteral(cents, scale), k, nProbe)
  }

  /** Trained centroids as the (cell_id, cent, centn) quantizer
    * literal [[ivfSearch]] consumes: de-quantize as cent/scale (one
    * correctly-rounded IEEE division per component), left-to-right
    * double norms — the construction the q65/q73 oracles replay. */
  private def trainedCentsLiteral(
      cents: IndexedSeq[(Int, IndexedSeq[Long])], scale: Long): Column = {
    val centMat = cents.map(_._2.map(_.toDouble / scale))
    val centNorms = centMat.map { v =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    import org.apache.spark.sql.types._
    val structType = StructType(Seq(
      StructField("cell_id", IntegerType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("centn", DoubleType, nullable = false)))
    org.apache.spark.sql.graftshim.ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cents.indices.map(i =>
          org.apache.spark.sql.Row(i, centMat(i), centNorms(i))),
        ArrayType(structType, containsNull = false)))
  }

  /** IVF-PQ ANN — the production 100 TB composition: a coarse IVF
    * quantizer routes each vector to a cell, a PRODUCT QUANTIZER
    * compresses every candidate to an `m`-byte code word (here m
    * ints; at 768-dim/m=96 this is a ~32× memory reduction — the
    * difference between "candidate vectors fit in executor memory"
    * and "every probe refetches the corpus"), probing scans only the
    * CODES via asymmetric-distance (ADC) lookups, and only the
    * `adcKeep` ADC survivors per query are reranked against their
    * exact vectors (an id equi-join refetch — the codes travel, the
    * corpus doesn't).
    *
    * Determinism end to end (gate q66 replays every stage in SQL):
    * the coarse quantizer is [[ivfTopK]]'s seed scheme (nCells
    * lowest-id vectors, cosine assignment, ties to the lower cell);
    * each PQ codebook is a [[trainCentroids]] fixed-point Lloyd loop
    * over that block's slice of the `floor(x·scale)` quantized
    * vectors (exact long arithmetic, lowest-id init); encode/ADC are
    * exact long squared-L2 ([[graft.functions.VectorFunctions.PqEncode]]
    * / [[PqAdcDist]], ties to the lower code; ADC ties to the lower
    * cand_id); the rerank is the shared exact-cosine tail.
    *
    * Plan shape: codebooks are driver-side metadata (m small Lloyd
    * loops = a few KB); encode and ADC are narrow codegen'd kernels;
    * the only shuffles are the cell equi-join, the per-query top-k
    * windows, and the rerank refetch join — no all-pairs anywhere.
    *
    * @param m      number of PQ blocks (must divide `dim`)
    * @param kSub   sub-centroids per block codebook
    * @param adcKeep ADC candidates per query that reach exact rerank
    * @param residual encode RESIDUALS (vector minus its cell's
    *                 quantized centroid) instead of raw vectors — the
    *                 faithful IVFADC of Jégou et al. (TPAMI 2011):
    *                 residuals concentrate near the origin, so the
    *                 codebooks spend their resolution where vectors
    *                 actually sit; queries subtract each PROBED cell's
    *                 centroid, so their code distances are computed in
    *                 that cell's residual frame (gate q72) */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 8,
      nProbe: Int = 2, m: Int = 4, kSub: Int = 4, iters: Int = 2,
      adcKeep: Int = 8, dim: Int = 64, scale: Long = 1000000L,
      residual: Boolean = false): DataFrame =
    ivfPqSearch(queries, candidates, idCol, vecCol, k, nCells, nProbe,
      m, kSub, iters, adcKeep, dim, scale, residual,
      trainedCoarse = None)

  /** IVFADC with a TRAINED coarse quantizer — the faithful FAISS/
    * Jégou-et-al. composition: the q53 fixed-point Lloyd loop trains
    * `kCells` coarse centroids (as in [[ivfTopKTrained]]), PQ encodes
    * each vector's RESIDUAL against its cell's QUANTIZED trained
    * centroid (exact long subtraction — the trained centroids are
    * already fixed-point, so the residual frame costs no rounding at
    * all), and search probes per-cell residual frames. Residuals only
    * concentrate near the origin when the coarse centroids actually
    * sit in the data — measured here: with the SEED quantizer residual
    * recall is WORSE (clustered 0.9469 vs 0.9947 raw), with the
    * trained one it recovers (the number the round's notes record) —
    * which is exactly why the literature trains the coarse stage.
    * Gate q73 replays coarse training, residual construction, block
    * trainings, ADC, and rerank bit-for-bit.
    *
    * Measured on the clustered recall corpus (prod config, 32 cells /
    * 8 probes / 8×16 codebooks, ADC budget 10·k): seed-coarse
    * residual 0.9469 < seed-coarse raw 0.9947 < trained-coarse 1.0
    * (either frame) — the residual frame needs centroids that sit in
    * the data. */
  def ivfPqTopKTrained(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, kCells: Int,
      coarseIters: Int, nProbe: Int = 2, m: Int = 4, kSub: Int = 4,
      iters: Int = 2, adcKeep: Int = 8, dim: Int = 64,
      scale: Long = 1000000L, residual: Boolean = true): DataFrame =
    ivfPqSearch(queries, candidates, idCol, vecCol, k, kCells, nProbe,
      m, kSub, iters, adcKeep, dim, scale, residual,
      trainedCoarse = Some(coarseIters))

  private def ivfPqSearch(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int,
      nProbe: Int, m: Int, kSub: Int, iters: Int,
      adcKeep: Int, dim: Int, scale: Long,
      residual: Boolean, trainedCoarse: Option[Int]): DataFrame = {
    require(nCells > 0 && nProbe > 0 && m > 0 && kSub > 0 &&
      adcKeep > 0 && dim > 0 && scale > 0,
      "nCells, nProbe, m, kSub, adcKeep, dim, scale must be positive")
    require(iters >= 0, "iters must be >= 0")
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    def quantized(v: Column) = colOf(
      graft.functions.VectorFunctions.QuantizeFloor(exprOf(v), scale))
    val blockLen = dim / m
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    // the coarse quantizer literal, plus (residual mode) the per-cell
    // QUANTIZED centroid frame the residual subtraction joins against
    val coarse: Option[(Column, Option[DataFrame])] = trainedCoarse match {
      case None =>
        val rows = centroidRows(candidates, idCol, vecCol, nCells,
          Some(dim))
        if (rows.isEmpty) None
        else {
          val qc = if (!residual) None else {
            val centIds = rows.map(_.get(0)).toSeq
            Some(broadcast(
              kmeansBase(candidates, idCol, vecCol, dim, scale)
                .where(col("__id").isin(centIds: _*))
                .select(col("__id").as("cell_id"),
                  col("__qv").as("__cqv"))))
          }
          Some((centsLiteralOf(rows, candidates.schema(idCol).dataType),
            qc))
        }
      case Some(coarseIters) =>
        val tc = trainCentroids(
          kmeansBase(candidates, idCol, vecCol, dim, scale), nCells,
          coarseIters, None)
        if (tc.isEmpty) None
        else {
          val qc = if (!residual) None else {
            import org.apache.spark.sql.types._
            val schema = StructType(Seq(
              StructField("cell_id", IntegerType, nullable = false),
              StructField("__cqv", ArrayType(LongType,
                containsNull = false), nullable = false)))
            val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
            tc.foreach { case (cell, qv) =>
              rows.add(org.apache.spark.sql.Row(cell, qv))
            }
            Some(broadcast(
              candidates.sparkSession.createDataFrame(rows, schema)))
          }
          Some((trainedCentsLiteral(tc, scale), qc))
        }
    }
    if (coarse.isEmpty) // empty corpus: empty result, correct schema
      return rerank(q.crossJoin(c).where(lit(false)), k)
    val (cents, qcentsOpt) = coarse.get
    // coarse assignment (candidates) + probe (queries), each carrying
    // its quantized vector; `__pqv` is what PQ sees — the quantized
    // vector itself, or (residual mode) the vector minus its cell's
    // quantized centroid, the classic IVFADC composition: residuals
    // concentrate around the origin, so one codebook set serves every
    // cell far better than vectors spread across the sphere
    val assigned0 = assignCells(c.where(size(col("__cv")) === dim),
        cents, "__cv", "__cn", keep = 1)
      .withColumn("__qv0", quantized(col("__cv")))
    val probed0 = assignCells(q.where(size(col("__qv")) === dim),
        cents, "__qv", "__qn", keep = nProbe)
      .withColumn("__qq0", quantized(col("__qv")))
    val (candVec, queryVec, trainBase) = if (!residual) {
      (assigned0.withColumn("__pqv", col("__qv0")),
        probed0.withColumn("__pqv", col("__qq0")),
        kmeansBase(candidates, idCol, vecCol, dim, scale))
    } else {
      // the quantized centroid per cell (a seed-quantizer cell whose
      // centroid row the quantized projection drops contributes no
      // residuals — inner joins, on both engines)
      val qcents = qcentsOpt.get
      def residualOf(v: Column) = colOf(
        graft.functions.VectorFunctions.VecSubLong(
          exprOf(v), exprOf(col("__cqv"))))
      val cc = assigned0.join(qcents, "cell_id")
        .withColumn("__pqv", residualOf(col("__qv0"))).drop("__cqv")
      val qq = probed0.join(qcents, "cell_id")
        .withColumn("__pqv", residualOf(col("__qq0"))).drop("__cqv")
      (cc, qq,
        cc.select(col("cand_id").as("__id"), col("__pqv").as("__qv")))
    }
    // the training loop drives 1 + iters eager jobs over trainBase —
    // in residual mode that frame is the coarse argmax + residual
    // join over the whole corpus, so cache it for the loop's duration
    // (training is collect-driven, so every cached read happens before
    // the unpersist; the one downstream encode pass recomputes lazily)
    val tb = trainBase.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books =
      try trainPqBooks(tb, m, blockLen, kSub, iters)
      finally tb.unpersist(blocking = false)
    // a corpus whose every vector the quantized projection (or the
    // residual join) drops: PqEncode requires non-empty codebooks
    if (books.isEmpty || books.exists(_.isEmpty))
      return rerank(q.crossJoin(c).where(lit(false)), k)
    val booksSeq = books.map(_.toSeq)
    val assignedC = candVec
      .withColumn("__codes", colOf(
        graft.functions.VectorFunctions.PqEncode(
          exprOf(col("__pqv")), booksSeq)))
      .select(col("cand_id"), col("cell_id"), col("__codes"))
    // ADC scan: codes-only candidates, exact-long approximate
    // distance, per-query top-adcKeep (ties to the lower cand_id)
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("cand_id").asc)
    val survivors = queryVec.join(assignedC, "cell_id")
      .withColumn("__adc", colOf(
        graft.functions.VectorFunctions.PqAdcDist(
          exprOf(col("__pqv")), exprOf(col("__codes")), booksSeq)))
      .withColumn("__adc_rk", row_number().over(adcW))
      .where(col("__adc_rk") <= adcKeep)
      .select(col("query_id"), col("cand_id"), col("__qv"), col("__qn"))
    // exact rerank: refetch only the survivors' vectors by id
    rerank(survivors.join(c, "cand_id"), k)
  }

  /** All `m` PQ codebooks trained in ONE Spark job per Lloyd round —
    * value-identical to running [[trainCentroids]] independently on
    * each block's slice (spec-pinned equivalence), but with 1 + iters
    * driver round-trips TOTAL instead of m·(1 + iters): at a
    * production 96-block quantizer the per-block formulation is ~300
    * tiny jobs whose scheduling overhead dwarfs the arithmetic.
    *
    * Per round: one narrow [[graft.functions.VectorFunctions.PqEncode]]
    * pass assigns every block's code (per-block exact-long argmin,
    * ties to the lower code — exactly the per-block
    * [[trainCentroids]] assignment), one posexplode + groupBy(block,
    * code, position) computes every codebook's component sums, and the
    * k·dim-sized result returns to the driver for the exact
    * floor-division update (empty cells keep their centroid). The
    * lowest-id init collects once and slices driver-side — the same k
    * rows each per-block loop would draw. */
  private[graft] def trainPqBooks(base: DataFrame, m: Int,
      blockLen: Int, kSub: Int, iters: Int)
      : IndexedSeq[Seq[Seq[Long]]] = {
    val initRows = base.orderBy(col("__id").asc).limit(kSub).collect()
    if (initRows.isEmpty) return IndexedSeq.empty
    var books: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
      (0 until m).map { b =>
        initRows.toIndexedSeq.map(r =>
          r.getSeq[Long](1).slice(b * blockLen, (b + 1) * blockLen)
            .toIndexedSeq)
      }
    for (_ <- 1 to iters) {
      val codes = colOf(graft.functions.VectorFunctions.PqEncode(
        exprOf(col("__qv")), books.map(_.map(_.toSeq).toSeq)))
      val sums = base.withColumn("__codes", codes)
        .select(col("__codes"),
          posexplode(col("__qv")).as(Seq("__pos", "__x")))
        .withColumn("__blk", (col("__pos") / blockLen).cast("int"))
        .withColumn("__code", element_at(col("__codes"), col("__blk") + 1))
        .groupBy(col("__blk"), col("__code"), col("__pos"))
        .agg(sum(col("__x")).as("__sum"), count(lit(1)).as("__cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          (r.getLong(3), r.getLong(4)))
        .toMap
      books = books.zipWithIndex.map { case (book, b) =>
        book.zipWithIndex.map { case (prev, c) =>
          prev.indices.map { j =>
            sums.get((b, c, b * blockLen + j)) match {
              case Some((s, n)) => Math.floorDiv(s, n)
              case None         => prev(j) // empty cell keeps centroid
            }
          }
        }
      }
    }
    books.map(_.map(_.toSeq).toSeq)
  }

  /** Embedding-space label audit: every vector's label is predicted by
    * the MAJORITY LABEL of its k nearest neighbors (self excluded,
    * found via the [[ivfTopK]] production path), and compared to its
    * own — the standard kNN-consistency check for embedding quality /
    * label-noise hunting over a training corpus ("which classes bleed
    * into each other in embedding space?").
    *
    * Deterministic: neighbor ranking is [[ivfTopK]]'s (sim desc, ties
    * to the lower cand_id, self pairs dropped BEFORE ranking); the
    * vote breaks ties to the SMALLEST label. Null-label neighbors
    * don't vote, and null-label vectors are excluded from the audit
    * (no ground truth to compare against); a vector whose probed cells
    * contain only itself yields no prediction and drops out (inner
    * joins on both engines). Gate q71 replays neighbor search, vote,
    * and tie-breaks exactly.
    *
    * Shape at scale: the ANN equi-joins dominate; the vote is one
    * `groupBy(query, label)` + a per-query top-1 window over ≤ k rows.
    * Because EVERY vector is a query, cell sizing is the complexity
    * knob: with C cells, assignment costs N·C and probing costs
    * ~nProbe·N²/C, so the default (`nCells = None`) self-sizes to
    * C = ceil(√N) — the balanced Θ(N^1.5) total, vs Θ(N²) at any
    * fixed C. One count() job picks C; ceil(sqrt(·)) over an exact
    * long is engine-reproducible (IEEE sqrt is correctly rounded), so
    * the q71 oracle mirrors the auto-sizing with a LIMIT subquery.
    * Note a per-corpus-doubling time ratio of ~2^1.5 ≈ 2.83 with flat
    * output is this operator's HEALTHY scaling — it is an all-pairs
    * audit, not a fixed-query search.
    *
    * @return (query_id, label, pred_label) — one row per audited
    *         vector */
  def knnClassify(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nCells: Option[Int] = None,
      nProbe: Int = 2, dim: Option[Int] = None): DataFrame = {
    val cells = nCells.getOrElse(
      math.max(1, math.ceil(math.sqrt(df.count().toDouble)).toInt))
    val nn = ivfTopK(df, df, idCol, vecCol, k, cells, nProbe, dim,
      excludeSelf = true)
    val nbrLabels = df.select(col(idCol).as("cand_id"),
      col(labelCol).as("__nl")).where(col("__nl").isNotNull)
    val votes = nn.join(nbrLabels, "cand_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__votes").desc, col("__nl").asc)
    val pred = votes.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("query_id"), col("__nl").as("pred_label"))
    val own = df.select(col(idCol).as("query_id"),
      col(labelCol).as("label")).where(col("label").isNotNull)
    pred.join(own, "query_id")
      .select(col("query_id"), col("label"), col("pred_label"))
  }

  private def kmeansSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("cell_id", LongType),
      StructField("n_vectors", LongType, nullable = false),
      StructField("sum_dist", LongType),
      StructField("cent_sum", LongType)))
  }

  /** Recall of an approximate top-k result against the exact one: the
    * fraction of exact (query_id, cand_id) pairs the approximate search
    * recovered. Both inputs are the (query_id, cand_id, sim, rank)
    * shape every top-k variant here returns. One output row:
    * (n_exact, n_hit, recall). Distributed end to end — a left-semi
    * join plus two counts — so it prices recall at any corpus size,
    * not just on collected samples. */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("query_id"), col("cand_id"))
    val hits = e.join(approx.select(col("query_id"), col("cand_id")),
      Seq("query_id", "cand_id"), "leftsemi")
    e.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_exact"), col("n_hit"),
        // 0/0 (empty ground truth) reads as 0.0, not null — a null
        // recall silently fails any `>= floor` health check as
        // null-is-false instead of surfacing a number
        round(coalesce(col("n_hit") / col("n_exact"), lit(0.0)), 4)
          .as("recall"))
  }

  /** Exact brute-force cosine top-k: for every query row, the k most
    * similar candidate rows. The candidate set is broadcast when small
    * enough (let Catalyst/AQE decide); similarity is computed once per
    * pair, then per-query top-k via window. Norms are precomputed on both
    * sides so the pair loop only does the dot product.
    *
    * @note SUPERSEDED BASELINE — the `crossJoin` is O(|Q|·|C|) by
    *       construction and exists as the exact-recall yardstick (gate
    *       q27). For anything beyond a small candidate table use
    *       [[bandedTopK]] (banded LSH + rerank) or [[ivfTopK]]
    *       (coarse-quantizer cells + nProbe) — both return the same
    *       (query_id, cand_id, sim, rank) shape. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
    rerank(q.crossJoin(c), k)
  }

  /** Approximate top-k: candidates restricted to the query's bucket.
    * The bucket equi-join replaces the cross product; at 100 TB this is one
    * shuffle on the bucket key with AQE handling bucket skew.
    * `seededDim = Some(dim)` switches from axis-aligned sign bits to the
    * seeded hyperplane scheme.
    *
    * @note SUPERSEDED BASELINE — a single bucket column caps the key
    *       space at 2^bits, so buckets grow near-quadratically as the
    *       corpus scales (gate q28 pins this variant). Production ANN
    *       should use [[bandedTopK]] (multi-band keys, full
    *       content-derived cardinality, recall 1-(1-p^bits)^bands) or
    *       [[ivfTopK]]; same output shape. */
  def bucketedTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 8,
      seededDim: Option[Int] = None, seed: Long = 42L): DataFrame = {
    def bucket(vec: Column): Column = seededDim match {
      case Some(dim) => hyperplaneBucket(vec, dim, bits, seed)
      case None => signBucket(vec, bits)
    }
    val q = normed(queries, idCol, vecCol, "query_id", "__qv", "__qn")
      .withColumn("__bucket", bucket(col("__qv")))
    val c = normed(candidates, idCol, vecCol, "cand_id", "__cv", "__cn")
      .withColumn("__bucket", bucket(col("__cv")))
    rerank(q.join(c, "__bucket"), k)
  }

  /** Banded-LSH near-duplicate pairs — the scalable successor to
    * [[nearDupPairs]]' single capped bucket: candidate pairs come from
    * ANY shared (band, key) — one equi-join per band over
    * 2^bitsPerBand-cardinality content-derived keys (AQE-splittable,
    * never all-pairs) — and the exact cosine runs on candidates only.
    * `sim` is rounded to 6 dp before the threshold compare so the
    * boundary is engine-portable (same convention as the q29 oracle). */
  def bandedNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bands: Int = 4, bitsPerBand: Int = 16,
      seed: Long = 42L): DataFrame =
    bandedNearDupPairsNormed(
      normed(vectors, idCol, vecCol, "__id", "__v", "__n"),
      threshold, dim, bands, bitsPerBand, seed)

  /** [[bandedNearDupPairs]] over an already-normed projection
    * (`__id`, `__v`, `__n` — the [[normed]] shape). Split out so callers
    * that reference the projection several times ([[embeddingDedupClusters]]
    * with `persistInput`) can persist ONE frame and have every pass —
    * band keying plus both rerank id-joins — read the cache. */
  private[graft] def bandedNearDupPairsNormed(v: DataFrame,
      threshold: Double, dim: Int, bands: Int, bitsPerBand: Int,
      seed: Long): DataFrame = {
    val keyed = bandKeyed(v, "__id", "__v", dim, bands, bitsPerBand, seed)
    val cand = keyed.as("a").join(keyed.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b")).distinct()
    cand
      .join(v.select(col("__id").as("id_a"), col("__v").as("__va"),
        col("__n").as("__na")), "id_a")
      .join(v.select(col("__id").as("id_b"), col("__v").as("__vb"),
        col("__n").as("__nb")), "id_b")
      .withColumn("sim",
        round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding near-duplicate CLUSTERING — the dedup (not search) shape
    * of banded LSH: [[bandedNearDupPairs]] candidates, then O(log n)
    * star-contraction connected components
    * ([[TextOps.dedupClustersStar]]). Every input id gets a label
    * (component min id); vectors with no near-duplicate label
    * themselves. Reference analogue: corpus-level semantic dedup over an
    * embedding column, end to end on DataFrames.
    *
    * Production note: the logical DAG references the normed projection
    * of `vectors` several times — band-key self-join sides share their
    * exchange via ReusedExchange, but the two rerank id-joins re-derive
    * the quantize/norm projection, and the final label join makes one
    * more (1-column) pass over the raw input — ~4 corpus passes on the
    * default plan. At gate scale recomputing a narrow projection is
    * cheaper than materializing; at a 100 TB corpus pass
    * `persistInput = Some(StorageLevel.MEMORY_AND_DISK)`: the normed
    * projection is persisted once, every pair-generation pass reads the
    * cache (the contraction loop already snapshots its edge list per
    * superstep, and the returned label plan references only the final
    * snapshot plus a 1-column scan of `vectors`), and the cache is
    * dropped before returning. Measured on the q45 bench shape the
    * persisted path executes ONE `InMemoryTableScan`-fed projection
    * build instead of three derivations of it; the bench-only x45 twin
    * prices the knob every round — at sf0.1 it is a wash (2.98 s
    * persisted vs 2.84 s default on a quiet run: materializing the
    * projection costs about what the three recomputes save), which is
    * exactly the crossover logic above — the knob pays once re-scanning
    * the RAW corpus dominates, i.e. wide rows or remote storage, not at
    * gate scale. Results are identical either way (q45 stays
    * oracle-green with the default). */
  def embeddingDedupClusters(vectors: DataFrame, idCol: String,
      vecCol: String, threshold: Double, dim: Int, bands: Int = 4,
      bitsPerBand: Int = 16, seed: Long = 42L,
      persistInput: Option[org.apache.spark.storage.StorageLevel] = None,
      maxIter: Int = 25, checkpointDir: Option[String] = None)
      : DataFrame = {
    val v0 = normed(vectors, idCol, vecCol, "__id", "__v", "__n")
    val v = persistInput.fold(v0)(v0.persist)
    try {
      val pairs = bandedNearDupPairsNormed(v, threshold, dim, bands,
        bitsPerBand, seed)
      // label loop runs (and snapshots) eagerly inside this call, so the
      // persisted projection is live for every pass that needs it; the
      // frame it returns derives from the final edge snapshot only.
      // maxIter/checkpointDir plumb through to the contraction loop —
      // at 100 TB over a long-running cluster, localCheckpoint block
      // loss is a real event and the reliable-checkpoint knob must be
      // reachable from this public entry point, not only from TextOps
      val labels = TextOps.starContractionLabels(pairs,
        maxIter = maxIter, checkpointDir = checkpointDir)
      vectors.select(col(idCol).as("doc_id")).distinct()
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id").as(idCol),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    } finally persistInput.foreach(_ => v.unpersist(blocking = false))
  }

  /** Embedding near-duplicate pairs: same sign bucket, cosine ≥ threshold,
    * each unordered pair once.
    *
    * @note SUPERSEDED BASELINE — single capped sign bucket (gate q29
    *       pins it). Production near-dup detection should use
    *       [[bandedNearDupPairs]] (banded keys, candidates never
    *       all-pairs) or [[embeddingDedupClusters]] for the full
    *       cluster-label dedup shape; same (id_a, id_b, sim) output. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 8): DataFrame = {
    val v = normed(vectors, idCol, vecCol, "__id", "__v", "__n")
      .withColumn("__bucket", signBucket(col("__v"), bits))
    val a = v.select(col("__id").as("id_a"), col("__v").as("__va"),
      col("__n").as("__na"), col("__bucket"))
    val b = v.select(col("__id").as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"), col("__bucket"))
    a.join(b, "__bucket")
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
