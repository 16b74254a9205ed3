package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd vector/array kernels replacing the `aggregate`/`zip_with`
  * higher-order-function formulations in [[graft.operators.Similarity]]
  * and `SparkEntry.winnowStats`.
  *
  * Spark's higher-order array functions (`ArrayAggregate`, `ZipWith`,
  * `ArrayTransform`) are `CodegenFallback`: inside an otherwise
  * whole-stage-codegen'd stage they evaluate INTERPRETED, binding a
  * `LambdaFunction` and boxing every element. For the similarity hot
  * paths that is per-element boxing per candidate PAIR — the dominant
  * per-row cost of ANN rerank, embedding dedup, and band-key
  * assignment (bands x bits x dim lambda evaluations per row). These
  * expressions compute the identical values (same left-to-right double
  * accumulation, same null semantics — documented per expression) as
  * one static-kernel call inside generated code, the same pattern as
  * [[TextKernels]] / `GenomicCodegen`.
  *
  * Reference parity note: the reference has no vector/ANN surface at
  * all (oxbow is a genomics scanner library); these back the
  * LLM-pipeline operators' 100 TB path.
  */
object VectorKernels {

  /** Σ aᵢ·bᵢ in double precision, left-to-right — exactly
    * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, +)`: a length
    * mismatch (zip_with pads the shorter side with null) or any null
    * element yields null. `aF`/`bF` select float vs double element
    * reads; the branch is hoisted outside the loop so each loop body
    * stays monomorphic. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean,
      bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    if (aF && bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
      }
    } else if (aF && !bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getFloat(i).toDouble * b.getDouble(i); i += 1
      }
    } else if (!aF && bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getDouble(i) * b.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getDouble(i) * b.getDouble(i); i += 1
      }
    }
    s
  }

  /** Generic-element variants for the PUBLIC dot/norm surface: the
    * HOF forms they replaced cast ANY numeric element to double
    * (`x.cast("double")`), so `Similarity.dot/cosine` on array<int>/
    * array<long> must keep working. Element codes: 0=float, 1=double,
    * 2=int, 3=long. Float/double pairs delegate to the specialized
    * monomorphic loops; integral paths take the (rare, compat-only)
    * per-element switch. */
  def dotWide(a: ArrayData, b: ArrayData, ac: Int,
      bc: Int): java.lang.Double = {
    if (ac <= 1 && bc <= 1) return dot(a, b, ac == 0, bc == 0)
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elemD(a, ac, i) * elemD(b, bc, i); i += 1
    }
    s
  }

  def normSqWide(a: ArrayData, ac: Int): java.lang.Double = {
    if (ac <= 1) return normSq(a, ac == 0)
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elemD(a, ac, i); s += x * x; i += 1
    }
    s
  }

  private def elemD(a: ArrayData, code: Int, i: Int): Double =
    code match {
      case 0 => a.getFloat(i).toDouble
      case 1 => a.getDouble(i)
      case 2 => a.getInt(i).toDouble
      case _ => a.getLong(i).toDouble
    }

  /** Σ aᵢ² in double precision, left-to-right — exactly
    * `aggregate(a, 0.0, (acc, x) => acc + x*x)`: any null element
    * yields null (sqrt stays OUTSIDE, applied by the caller, so the
    * final rounding path is Spark's own). */
  def normSq(a: ArrayData, aF: Boolean): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (aF) {
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getFloat(i).toDouble; s += x * x; i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getDouble(i); s += x * x; i += 1
      }
    }
    s
  }

  /** Σ (aᵢ-bᵢ)² in double precision, left-to-right — exactly
    * `aggregate(zip_with(a, b, (x, c) => (x-c)*(x-c)), 0.0, +)` with
    * the same mismatch/null-element → null semantics as [[dot]]. */
  def distSq(a: ArrayData, b: ArrayData, aF: Boolean,
      bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    if (aF && bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
        s += d * d; i += 1
      }
    } else if (aF && !bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getFloat(i).toDouble - b.getDouble(i); s += d * d; i += 1
      }
    } else if (!aF && bF) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getDouble(i) - b.getFloat(i).toDouble; s += d * d; i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1
      }
    }
    s
  }

  /** Σ (aᵢ-bᵢ)² over array<long> in EXACT long arithmetic — the
    * fixed-point k-means distance (`Similarity.kmeansFixedPoint`
    * quantizes to longs precisely so sums are order-independent and
    * bit-identical across engines; its scaladoc bounds the magnitudes
    * at ~2⁴⁷, far from wrap). Mismatch/null-element → null, matching
    * the `aggregate(zip_with(...))` form it replaces. */
  def distSqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1
    }
    s
  }

  /** Σ elements of an array<long> — exactly
    * `aggregate(a, 0L, (acc, x) => acc + x)`: null element → null.
    * Plain (wrapping) +: the one caller sums 32-bit-masked winnow
    * fingerprints (each < 2³²) over per-document gram counts, which
    * cannot reach 2⁶³. */
  def sumLong(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      s += a.getLong(i); i += 1
    }
    s
  }

  /** LSH band key from a sign-bit matrix: bit i = (dot(v, planes(i)) >
    * 0), key = Σ bitᵢ·2ⁱ. Parity contract (both HOF call sites it
    * replaces): a null dot — null vector ELEMENT, or length mismatch —
    * contributes bit 0 via the `when(...).otherwise(0)` fallthrough,
    * and a NULL VECTOR yields key 0, not null (`when(dot(null,p) > 0,
    * ...)` is false for every plane). A NaN dot sets the bit: Spark's
    * `>` orders NaN GREATER than everything (unlike Java primitives) —
    * parity-spec-pinned; production vectors never reach here with NaN
    * (`Similarity.normed` drops them) but the kernel must match the
    * HOF spec the oracles mirror. */
  def planeSignBits(v: ArrayData, vF: Boolean,
      planes: Array[Array[Double]]): Long = {
    var key = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val d = dotPlane(v, vF, p)
      // null fails the > test; NaN passes it (Spark NaN-is-greatest)
      if (d != null &&
          (d.doubleValue() > 0.0 || d.doubleValue().isNaN)) key |= 1L << i
      i += 1
    }
    key
  }

  /** Bucket index in a SORTED ascending bounds array — exactly
    * `size(filter(boundsLit, b => x >= b))` (the prefixSum bucket
    * function): count of bounds ≤ x, binary-searched instead of an
    * interpreted per-bound lambda per row. Parity: a null x drops
    * every filter element (count 0); NaN ≥ everything under Spark
    * ordering (count = all). */
  def sortedBucket(xNull: Boolean, x: Double,
      bounds: Array[Double]): Int = {
    if (xNull) return 0
    if (java.lang.Double.isNaN(x)) return bounds.length
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (x >= bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** true iff NO element is null, NaN or ±Infinity — exactly
    * `!exists(cast(a as array<double>), x => x.isNull || isnan(x) ||
    * abs(x) === Inf)` (the k-means finite-vector filter); null array
    * → null via the caller's nullSafeEval. Element code as in
    * [[dotWide]] — the replaced HOF's cast accepted any numeric
    * element type. */
  def allFinite(a: ArrayData, ac: Int): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return false
      val x = elemD(a, ac, i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        return false
      i += 1
    }
    true
  }

  /** `transform(cast(a as array<double>), x => floor(x*scale)
    * .cast(long))` — the k-means fixed-point quantization, any
    * numeric element type like the cast it replaces. Null elements
    * pass through; NaN/Inf elements are OUT OF CONTRACT here (the
    * [[allFinite]] filter runs first — a Java toLong saturates where
    * an ANSI cast would throw, which only an unfiltered caller could
    * observe). */
  def quantizeFloor(a: ArrayData, ac: Int, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        out(i) = java.lang.Math.floor(elemD(a, ac, i) * scale).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spark `GreaterThan` on doubles: NaN orders GREATER than
    * everything, NaN > NaN is false. */
  private def sparkGt(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else if (java.lang.Double.isNaN(b)) false
    else a > b

  /** Top-`keep` centroid INDICES by cosine — the IVF assignment
    * argmax (`Similarity.assignCells`), one kernel loop instead of an
    * interpreted `transform` of nCells dot-lambdas + fold/array_sort
    * per row. Centroids are ordered by ascending cell id, so index
    * order IS the tie-break order of both HOF branches it replaces.
    *
    * Parity contract (spec-pinned): sim_i = dot(v, cent_i)/(n·centn_i)
    * with null propagation (null/`wrong-length` vector → null sims).
    *   keep == 1 — the fold `when(x.sim > acc.sim || (x.sim ===
    *   acc.sim && x.cell < acc.cell), x).otherwise(acc)` seeded with
    *   cell 0: a null-sim SEED is sticky (`null > ...` is never true),
    *   so all-null or first-null sims return cell 0; later null sims
    *   never win; NaN via Spark ordering (sparkGt).
    *   keep > 1 — the `array_sort` comparator (sim desc with Spark
    *   NaN ordering, then cell asc; null sims fall through to the
    *   cell compare), take `min(keep, nCells)`. */
  def cellTopK(v: ArrayData, vF: Boolean, nNull: Boolean, n: Double,
      cents: Array[Array[Double]], centNorms: Array[Double],
      keep: Int): ArrayData = {
    // primitive sims + explicit null mask (NaN is a MEANINGFUL sim
    // value under Spark ordering, so it cannot double as the null
    // sentinel) — no boxing per cell, the point of this kernel
    val k = cents.length
    val sims = new Array[Double](k)
    val simNull = new Array[Boolean](k)
    if (v == null || nNull) java.util.Arrays.fill(simNull, true)
    else {
      var i = 0
      while (i < k) {
        fillSim(v, vF, cents(i), n, centNorms(i), sims, simNull, i)
        i += 1
      }
    }
    if (keep == 1) {
      val out = new Array[Any](1)
      if (simNull(0)) { out(0) = 0; return new GenericArrayData(out) }
      var best = 0
      var bestSim = sims(0)
      var i = 1
      while (i < k) {
        if (!simNull(i) && sparkGt(sims(i), bestSim)) {
          best = i; bestSim = sims(i)
        }
        i += 1
      }
      out(0) = best
      new GenericArrayData(out)
    } else {
      // bounded top-m insertion (m = min(keep, k)): O(k·m) compares,
      // allocation-free — same total order as the full sort it
      // replaces (sim desc with Spark NaN ordering, then index asc;
      // null sims fall through to the index compare)
      val m = math.min(keep, k)
      val best = new Array[Int](m)
      var size = 0
      var i = 0
      while (i < k) {
        if (size < m) {
          var pos = size
          while (pos > 0 && cmpIdx(i, best(pos - 1), sims, simNull) < 0) {
            best(pos) = best(pos - 1); pos -= 1
          }
          best(pos) = i; size += 1
        } else if (cmpIdx(i, best(m - 1), sims, simNull) < 0) {
          var pos = m - 1
          while (pos > 0 && cmpIdx(i, best(pos - 1), sims, simNull) < 0) {
            best(pos) = best(pos - 1); pos -= 1
          }
          best(pos) = i
        }
        i += 1
      }
      val out = new Array[Any](m)
      i = 0
      while (i < m) { out(i) = best(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** sim_i = dot(v, p)/(n·cn) into the primitive arrays; null dot
    * (length mismatch or null element) marks the null mask instead. */
  private def fillSim(v: ArrayData, vF: Boolean, p: Array[Double],
      n: Double, cn: Double, sims: Array[Double],
      simNull: Array[Boolean], i: Int): Unit = {
    val len = v.numElements()
    if (p.length != len) { simNull(i) = true; return }
    var s = 0.0
    var j = 0
    if (vF) {
      while (j < len) {
        if (v.isNullAt(j)) { simNull(i) = true; return }
        s += v.getFloat(j).toDouble * p(j); j += 1
      }
    } else {
      while (j < len) {
        if (v.isNullAt(j)) { simNull(i) = true; return }
        s += v.getDouble(j) * p(j); j += 1
      }
    }
    sims(i) = s / (n * cn)
  }

  /** The keep>1 comparator: sim desc (Spark NaN ordering), null sims
    * fall through to the ascending index compare. */
  private def cmpIdx(a: Int, b: Int, sims: Array[Double],
      simNull: Array[Boolean]): Int = {
    if (!simNull(a) && !simNull(b)) {
      if (sparkGt(sims(a), sims(b))) return -1
      if (sparkGt(sims(b), sims(a))) return 1
    }
    Integer.compare(a, b)
  }

  /** Fixed-point k-means assignment: argmin cell by EXACT long squared
    * L2 against the centroid matrix, plus the minimum distance — the
    * `Similarity.kmeansFixedPoint` per-row pass, replacing the
    * interpreted transform + argmin-fold + array_min.
    *
    * Parity: fold ties break to the lower cell (= lower index —
    * centroids ride in cell order); a null-dist SEED is sticky (cell
    * 0); dist output is `array_min` semantics — min over NON-null
    * dists, null only if all are (nulls only arise from dim
    * mismatches, which the caller filters). Returns a 2-slot struct
    * row (cell int, dist nullable long). */
  def cellArgMinL2(v: ArrayData,
      cents: Array[Array[Long]]): InternalRow = {
    val k = cents.length
    val out = new Array[Any](2)
    out(0) = 0
    if (v == null) return new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(out)
    val dists = new Array[java.lang.Long](k)
    var i = 0
    while (i < k) {
      dists(i) = distSqLongPlane(v, cents(i))
      i += 1
    }
    // argmin fold, sticky-null seed
    if (dists(0) != null) {
      var best = 0
      var bestD = dists(0).longValue()
      i = 1
      while (i < k) {
        val di = dists(i)
        if (di != null && di.longValue() < bestD) {
          best = i; bestD = di.longValue()
        }
        i += 1
      }
      out(0) = best
    }
    // array_min over non-null dists
    var minD: java.lang.Long = null
    i = 0
    while (i < k) {
      val di = dists(i)
      if (di != null && (minD == null || di.longValue() < minD.longValue()))
        minD = di
      i += 1
    }
    out(1) = if (minD == null) null else minD.longValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def distSqLongPlane(a: ArrayData,
      c: Array[Long]): java.lang.Long = {
    val n = a.numElements()
    if (c.length != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getLong(i) - c(i); s += d * d; i += 1
    }
    s
  }

  private def dotPlane(v: ArrayData, vF: Boolean,
      p: Array[Double]): java.lang.Double = {
    val n = v.numElements()
    if (p.length != n) return null
    var s = 0.0
    var i = 0
    if (vF) {
      while (i < n) {
        if (v.isNullAt(i)) return null
        s += v.getFloat(i).toDouble * p(i); i += 1
      }
    } else {
      while (i < n) {
        if (v.isNullAt(i)) return null
        s += v.getDouble(i) * p(i); i += 1
      }
    }
    s
  }

  /** Element-wise long subtraction a − b — the residual step of
    * IVFADC (candidate/query quantized vector minus its cell's
    * quantized centroid). Null/any-null-element input or a length
    * mismatch → null (residual undefined). */
  def vecSubLong(a: ArrayData, b: ArrayData): ArrayData = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      out(i) = a.getLong(i) - b.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization encode: block `b` of the quantized vector
    * (the contiguous slice whose length is codebook `b`'s centroid
    * dimension) maps to the code of its nearest sub-centroid by EXACT
    * long squared L2, ties to the LOWER code (codebooks ride in cell
    * order, same convention as [[cellArgMinL2]]).
    *
    * Contract (new primitive — no HOF predecessor; the q66 oracle
    * mirrors this definition): null/any-null-element vector or a total
    * length ≠ Σ block lengths → null (encode undefined), never a
    * partial code word. */
  def pqEncode(v: ArrayData,
      books: Array[Array[Array[Long]]]): ArrayData = {
    if (v == null) return null
    var total = 0
    var b = 0
    while (b < books.length) { total += books(b)(0).length; b += 1 }
    if (v.numElements() != total) return null
    val out = new Array[Any](books.length)
    var off = 0
    b = 0
    while (b < books.length) {
      val book = books(b)
      val len = book(0).length
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var s = 0L
        var j = 0
        while (j < len) {
          if (v.isNullAt(off + j)) return null
          val d = v.getLong(off + j) - cent(j)
          s += d * d
          j += 1
        }
        if (s < bestD) { best = c; bestD = s }
        c += 1
      }
      out(b) = best
      off += len
      b += 1
    }
    new GenericArrayData(out)
  }

  /** PQ asymmetric distance: Σ over blocks of the exact long squared
    * L2 between the QUERY's block slice and the candidate's coded
    * sub-centroid `books(b)(codes(b))` — the ADC scan of IVF-PQ, with
    * the classic per-query lookup table inlined (kSub is small here;
    * at production kSub=256 the per-query LUT materializes once per
    * partition, same kernel shape).
    *
    * Contract: null vector/codes (caller-filtered), wrong vector or
    * code-word length, null element, or out-of-range code → null. */
  def pqAdcDist(v: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Long]]]): java.lang.Long = {
    if (v == null || codes == null) return null
    if (codes.numElements() != books.length) return null
    var total = 0
    var b = 0
    while (b < books.length) { total += books(b)(0).length; b += 1 }
    if (v.numElements() != total) return null
    var acc = 0L
    var off = 0
    b = 0
    while (b < books.length) {
      if (codes.isNullAt(b)) return null
      val book = books(b)
      val len = book(0).length
      val code = codes.getInt(b)
      if (code < 0 || code >= book.length) return null
      val cent = book(code)
      var j = 0
      while (j < len) {
        if (v.isNullAt(off + j)) return null
        val d = v.getLong(off + j) - cent(j)
        acc += d * d
        j += 1
      }
      off += len
      b += 1
    }
    acc
  }
}

/** Catalyst expressions over [[VectorKernels]]. Element types resolve
  * at planning time, so generated code calls each kernel with constant
  * type flags and C2 drops the dead loops. The embedding-internal
  * expressions (VecDistSq, PlaneSignBits, CellTopK) accept
  * array<float|double>; the PUBLIC surfaces whose HOF predecessors
  * cast elements to double (VecDot, VecNormSq, AllFinite,
  * QuantizeFloor) additionally accept array<int|long>. */
object VectorFunctions {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got ${other.simpleString}")
  }

  private def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name expects array<float|double>, got ${other.simpleString}")
    }

  // the public dot/norm surface additionally accepts integral-element
  // arrays (the HOF forms cast every element to double, so callers
  // passing array<int>/array<long> must keep working)
  private def elemCodeOf(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case other => throw new IllegalArgumentException(
      s"expected numeric array, got ${other.simpleString}")
  }

  private def checkVecWide(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name expects a numeric array, got ${other.simpleString}")
    }

  /** Σ aᵢ·bᵢ (double) — codegen'd `aggregate(zip_with(...))`. Accepts
    * any numeric-element arrays (the HOF cast every element to
    * double). */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val l = checkVecWide(left, prettyName)
      if (l.isSuccess) checkVecWide(right, prettyName) else l
    }
    private lazy val aC = elemCodeOf(left)
    private lazy val bC = elemCodeOf(right)
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.dotWide(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], aC, bC)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("dotRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |java.lang.Double $boxed =
        |  graft.functions.VectorKernels.dotWide($a, $b, $aC, $bC);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.doubleValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "vec_dot"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): VecDot = copy(left = l, right = r)
  }

  /** Σ aᵢ² (double) — codegen'd; caller applies sqrt. Accepts any
    * numeric-element array (see [[VecDot]]). */
  case class VecNormSq(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVecWide(child, prettyName)
    private lazy val aC = elemCodeOf(child)
    override def nullSafeEval(a: Any): Any =
      VectorKernels.normSqWide(a.asInstanceOf[ArrayData], aC)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("nsqRes")
      nullSafeCodeGen(ctx, ev, a => s"""
        |java.lang.Double $boxed =
        |  graft.functions.VectorKernels.normSqWide($a, $aC);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.doubleValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "vec_norm_sq"
    override protected def withNewChildInternal(c: Expression): VecNormSq =
      copy(child = c)
  }

  /** Σ (aᵢ-bᵢ)² (double) — codegen'd squared L2 distance. */
  case class VecDistSq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val l = checkVec(left, prettyName)
      if (l.isSuccess) checkVec(right, prettyName) else l
    }
    private lazy val aF = elemIsFloat(left)
    private lazy val bF = elemIsFloat(right)
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.distSq(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], aF, bF)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("dsqRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |java.lang.Double $boxed =
        |  graft.functions.VectorKernels.distSq($a, $b, $aF, $bF);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.doubleValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "vec_dist_sq"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): VecDistSq = copy(left = l, right = r)
  }

  private def checkLongVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<bigint>, got ${other.simpleString}")
    }

  /** Σ (aᵢ-bᵢ)² over array<long>, exact — codegen'd. */
  case class VecDistSqLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkLongVec(left, prettyName)
      if (l.isSuccess) checkLongVec(right, prettyName) else l
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.distSqLong(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("dsqlRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |java.lang.Long $boxed =
        |  graft.functions.VectorKernels.distSqLong($a, $b);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.longValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "vec_dist_sq_long"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): VecDistSqLong = copy(left = l, right = r)
  }

  /** Σ elements of array<long> — codegen'd `aggregate(a, 0L, +)`. */
  case class ArraySumLong(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(
              s"$prettyName expects array<bigint>, got ${other.simpleString}")
      }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.sumLong(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("sumRes")
      nullSafeCodeGen(ctx, ev, a => s"""
        |java.lang.Long $boxed = graft.functions.VectorKernels.sumLong($a);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.longValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "array_sum_long"
    override protected def withNewChildInternal(c: Expression): ArraySumLong =
      copy(child = c)
  }

  /** prefixSum's bucket function (see [[VectorKernels.sortedBucket]]).
    * NOT nullSafe: a null order key yields bucket 0 (the filter-HOF
    * drops every element on a null predicate), not null. */
  case class SortedBucket(child: Expression, bounds: Seq[Double])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case DoubleType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects double, got ${other.simpleString}")
      }
    @transient private lazy val boundsArr: Array[Double] = bounds.toArray
    override def eval(input: InternalRow): Any = {
      val x = child.eval(input)
      VectorKernels.sortedBucket(x == null,
        if (x == null) 0.0 else x.asInstanceOf[Double], boundsArr)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("bounds", boundsArr, "double[]")
      val c = child.genCode(ctx)
      ev.copy(isNull = FalseLiteral, code = code"""
        ${c.code}
        int ${ev.value} = graft.functions.VectorKernels.sortedBucket(
          ${c.isNull}, ${c.isNull} ? 0.0 : ${c.value}, $bRef);""")
    }
    override def prettyName: String = "sorted_bucket"
    override protected def withNewChildInternal(c: Expression)
        : SortedBucket = copy(child = c)
  }

  /** k-means finite filter (see [[VectorKernels.allFinite]]);
    * null array → null, matching `!exists(...)`. Accepts any numeric
    * element type (the replaced HOF cast to array<double> first). */
  case class AllFinite(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecWide(child, prettyName)
    private lazy val aC = elemCodeOf(child)
    override def nullSafeEval(a: Any): Any =
      VectorKernels.allFinite(a.asInstanceOf[ArrayData], aC)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.allFinite($a, $aC);")
    override def prettyName: String = "all_finite"
    override protected def withNewChildInternal(c: Expression)
        : AllFinite = copy(child = c)
  }

  /** k-means fixed-point quantization (see
    * [[VectorKernels.quantizeFloor]]); null array → null. Accepts any
    * numeric element type (see [[AllFinite]]). */
  case class QuantizeFloor(child: Expression, scale: Long)
      extends UnaryExpression {
    require(scale > 0, "scale must be positive")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = true)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecWide(child, prettyName)
    private lazy val aC = elemCodeOf(child)
    override def nullSafeEval(a: Any): Any =
      VectorKernels.quantizeFloor(a.asInstanceOf[ArrayData], aC, scale)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.quantizeFloor(" +
          s"$a, $aC, ${scale}L);")
    override def prettyName: String = "quantize_floor"
    override protected def withNewChildInternal(c: Expression)
        : QuantizeFloor = copy(child = c)
  }

  /** IVF assignment argmax: top-`keep` centroid indices by cosine
    * (see [[VectorKernels.cellTopK]] for the parity contract). NOT
    * nullSafe: null vector/norm must yield the sticky-null result
    * (index prefix), not null — matching the HOF fold/sort it
    * replaces. */
  case class CellTopK(left: Expression, right: Expression,
      cents: Seq[Seq[Double]], centNorms: Seq[Double], keep: Int)
      extends BinaryExpression {
    require(cents.nonEmpty && cents.size == centNorms.size && keep > 0,
      s"need matching non-empty centroids/norms and keep > 0")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkVec(left, prettyName)
      if (!l.isSuccess) return l
      right.dataType match {
        case DoubleType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName norm must be double, got ${other.simpleString}")
      }
    }
    private lazy val vF = elemIsFloat(left)
    @transient private lazy val centsArr: Array[Array[Double]] =
      cents.map(_.toArray).toArray
    @transient private lazy val centNormsArr: Array[Double] =
      centNorms.toArray
    override def eval(input: InternalRow): Any = {
      val v = left.eval(input)
      val n = right.eval(input)
      VectorKernels.cellTopK(
        v.asInstanceOf[ArrayData], vF, n == null,
        if (n == null) 0.0 else n.asInstanceOf[Double],
        centsArr, centNormsArr, keep)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("cents", centsArr, "double[][]")
      val normsRef = ctx.addReferenceObj("centNorms", centNormsArr,
        "double[]")
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      val vfStr = if (vF) "true" else "false"
      ev.copy(isNull = FalseLiteral, code = code"""
        ${l.code}
        ${r.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.VectorKernels.cellTopK(
            ${l.isNull} ? null : ${l.value}, $vfStr,
            ${r.isNull}, ${r.isNull} ? 0.0 : ${r.value},
            $centsRef, $normsRef, $keep);""")
    }
    override def prettyName: String = "cell_top_k"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): CellTopK = copy(left = l, right = r)
  }

  /** Fixed-point k-means argmin (see [[VectorKernels.cellArgMinL2]]).
    * NOT nullSafe: null vector → (cell 0, null dist), the sticky-null
    * fold result. */
  case class CellArgMinL2(child: Expression, cents: Seq[Seq[Long]])
      extends UnaryExpression {
    require(cents.nonEmpty, "need at least one centroid")
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("dist", LongType, nullable = true)))
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      checkLongVec(child, prettyName)
    @transient private lazy val centsArr: Array[Array[Long]] =
      cents.map(_.toArray).toArray
    override def eval(input: InternalRow): Any =
      VectorKernels.cellArgMinL2(
        child.eval(input).asInstanceOf[ArrayData], centsArr)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("kmCents", centsArr, "long[][]")
      val c = child.genCode(ctx)
      ev.copy(isNull = FalseLiteral, code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.VectorKernels.cellArgMinL2(
            ${c.isNull} ? null : ${c.value}, $centsRef);""")
    }
    override def prettyName: String = "cell_argmin_l2"
    override protected def withNewChildInternal(c: Expression)
        : CellArgMinL2 = copy(child = c)
  }

  /** LSH band key: bit i = sign(v · planes(i)), key = Σ bitᵢ·2ⁱ.
    * Replaces the `transform(planes, p => when(dot > 0, 1L)) →
    * zip_with(bits, weights) → aggregate` tree (bands × bits × dim
    * interpreted lambda evaluations per row) with ONE kernel loop.
    *
    * `planes` is a Seq-of-Seq (structural equality — two expressions
    * built from the same seed compare semantically equal, which plan
    * dedup / ReusedExchange detection relies on); the kernel walks a
    * transient Array form.
    *
    * NOT nullSafeEval: a null vector must yield key 0L, not null —
    * the `when(dot(null, p) > 0, ...).otherwise(0)` fallthrough of
    * both HOF call sites it replaces. */
  case class PlaneSignBits(child: Expression, planes: Seq[Seq[Double]])
      extends UnaryExpression {
    require(planes.nonEmpty && planes.size <= 63,
      s"1..63 planes (long key), got ${planes.size}")
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(child, prettyName)
    private lazy val vF = elemIsFloat(child)
    @transient private lazy val planesArr: Array[Array[Double]] =
      planes.map(_.toArray).toArray
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0L
      else VectorKernels.planeSignBits(v.asInstanceOf[ArrayData], vF,
        planesArr)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planesArr, "double[][]")
      val c = child.genCode(ctx)
      ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral,
        code = code"""
          |${c.code}
          |long ${ev.value} = 0L;
          |if (!${c.isNull}) {
          |  ${ev.value} = graft.functions.VectorKernels.planeSignBits(
          |    ${c.value}, $vF, $planesRef);
          |}
          |""".stripMargin)
    }
    override def prettyName: String = "plane_sign_bits"
    override protected def withNewChildInternal(c: Expression)
        : PlaneSignBits = copy(child = c)
  }

  private def checkLongVecOf(e: Expression, name: String)
      : TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<bigint>, got ${other.simpleString}")
  }

  /** Residual subtraction (see [[VectorKernels.vecSubLong]]);
    * null-safe on both children. */
  case class VecSubLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkLongVecOf(left, prettyName)
      if (l.isSuccess) checkLongVecOf(right, prettyName) else l
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.vecSubLong(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("subRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
        |  graft.functions.VectorKernels.vecSubLong($a, $b);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed; }
        |""".stripMargin)
    }
    override def prettyName: String = "vec_sub_long"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): VecSubLong = copy(left = l, right = r)
  }

  /** PQ encode (see [[VectorKernels.pqEncode]] for the parity
    * contract): quantized vector → per-block nearest-sub-centroid
    * code word. Null-safe: null vector → null code word. */
  case class PqEncode(child: Expression, books: Seq[Seq[Seq[Long]]])
      extends UnaryExpression {
    require(books.nonEmpty && books.forall(_.nonEmpty) &&
      books.forall(b => b.forall(_.length == b.head.length)),
      "need non-empty codebooks with equal-dim centroids per block")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkLongVecOf(child, prettyName)
    @transient private lazy val booksArr: Array[Array[Array[Long]]] =
      books.map(_.map(_.toArray).toArray).toArray
    override def nullSafeEval(a: Any): Any =
      VectorKernels.pqEncode(a.asInstanceOf[ArrayData], booksArr)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val booksRef = ctx.addReferenceObj("pqBooks", booksArr, "long[][][]")
      val boxed = ctx.freshName("pqCodes")
      nullSafeCodeGen(ctx, ev, a => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
        |  graft.functions.VectorKernels.pqEncode($a, $booksRef);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed; }
        |""".stripMargin)
    }
    override def prettyName: String = "pq_encode"
    override protected def withNewChildInternal(c: Expression)
        : PqEncode = copy(child = c)
  }

  /** PQ asymmetric distance (see [[VectorKernels.pqAdcDist]]):
    * quantized query vector × candidate code word → exact long
    * approximate squared L2. Null-safe on both children. */
  case class PqAdcDist(left: Expression, right: Expression,
      books: Seq[Seq[Seq[Long]]]) extends BinaryExpression {
    require(books.nonEmpty && books.forall(_.nonEmpty) &&
      books.forall(b => b.forall(_.length == b.head.length)),
      "need non-empty codebooks with equal-dim centroids per block")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkLongVecOf(left, prettyName)
      if (!l.isSuccess) return l
      right.dataType match {
        case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName codes must be array<int>, got ${other.simpleString}")
      }
    }
    @transient private lazy val booksArr: Array[Array[Array[Long]]] =
      books.map(_.map(_.toArray).toArray).toArray
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.pqAdcDist(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], booksArr)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val booksRef = ctx.addReferenceObj("pqBooks", booksArr, "long[][][]")
      val boxed = ctx.freshName("adcRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |java.lang.Long $boxed =
        |  graft.functions.VectorKernels.pqAdcDist($a, $b, $booksRef);
        |if ($boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $boxed.longValue(); }
        |""".stripMargin)
    }
    override def prettyName: String = "pq_adc_dist"
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): PqAdcDist = copy(left = l, right = r)
  }
}
