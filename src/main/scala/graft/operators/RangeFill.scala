package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim

/** Skew-robust distributed running fill: the range-partitioned two-pass
  * replacement for the textbook
  * `last(c, ignoreNulls = true) OVER (PARTITION BY key ORDER BY ...
  * ROWS UNBOUNDED PRECEDING)` window, whose one-task-per-key shape
  * serializes an entire stage on a skewed key (one chromosome holding
  * most of a genome's intervals, one symbol holding most of a tape's
  * ticks). Results are IDENTICAL to the window formulation; only the
  * physical plan changes.
  *
  * Scale shape (the same two-pass pattern as [[IntervalOps.coverage]]'s
  * breakpoint prefix sum): ONE range shuffle on (key, ordering) spreads
  * every key across as many partitions as its row share demands — a
  * single-key load uses ALL partitions, not one task. Pass A summarizes
  * each sorted partition into four scalars (first key, last key, last
  * non-null fill value of the trailing key run) — O(partitions) driver
  * state, INDEPENDENT of key cardinality: range partitions are
  * contiguous in the total order, so only a partition's FIRST key can
  * continue from earlier partitions, and its carry-in is found by
  * walking summaries backward while the previous partition's last key
  * still matches (chaining across all-null runs). Pass B streams each
  * sorted partition once, seeded from the broadcast carries. Both
  * passes share one RDD, so the range shuffle's map stage runs once.
  *
  * Both passes run on the plan's `InternalRow`s directly (the sorted
  * rows pass through untouched unless they need a fill, and the
  * re-wrap is [[PlanShim.internalCreateDataFrame]]) — no external-Row
  * decode/re-encode leg. Cost vs the window: one range-boundary
  * sampling job plus the (tiny) pass-A summary job — the price of skew
  * robustness. Callers with guaranteed-balanced high-cardinality keys
  * can keep the plain window; callers that cannot bound the largest
  * key's share should use this.
  */
object RangeFill {

  /** @param df      input frame
    * @param key      partition-key column name (the window's
    *                 PARTITION BY); null keys group together, exactly
    *                 as `Window.partitionBy` groups them
    * @param fillCol  column to fill: each row gets the latest non-null
    *                 value of this column at-or-before it in
    *                 (key, order) sort order (its own value when
    *                 non-null — the inclusive running frame)
    * @param order    the window's ORDER BY within each key (sort
    *                 direction and null placement respected)
    * @param partitions range-partition count; 0 = the session's
    *                 shuffle-partition default
    * @return the input rows (in range-partition order) with `fillCol`
    *         filled; schema unchanged */
  def fill(df: DataFrame, key: String, fillCol: String,
      order: Seq[Column], partitions: Int = 0): DataFrame = {
    val session = df.sparkSession
    val n = if (partitions > 0) partitions
      else session.sessionState.conf.numShufflePartitions
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val fillIdx = schema.fieldIndex(fillCol)
    val fieldTypes = schema.fields.map(_.dataType)
    val keyType = fieldTypes(keyIdx)
    val fillType = fieldTypes(fillIdx)
    val numFields = fieldTypes.length
    // the range exprs ARE the full window ordering (key first): range
    // partitions then concatenate to the exact global sort the window
    // would produce, and equal key tuples never straddle a boundary
    val sortExprs = col(key).asc +: order
    // ONE shared RDD for both passes (pass B reuses pass A's completed
    // range-shuffle map stage instead of re-shuffling). toRdd hands
    // back the plan's own (possibly reused) UnsafeRows, so every value
    // retained ACROSS rows below is detached via InternalRow.copyValue;
    // values forwarded within one iterator step ride the live buffer
    // (the consumer projects each row before pulling the next).
    // RangeShuffle (r22): the shuffle width adapts to the plan's size
    // estimate when the caller left the count at the session default
    // (an explicit `partitions` argument is honored exactly).
    val rdd = org.apache.spark.sql.graftshim.RangeShuffle
      .rangeSortedDf(df, sortExprs, Nil, n, adapt = partitions <= 0)
      .queryExecution.toRdd
    def keyOf(r: InternalRow): Any =
      if (r.isNullAt(keyIdx)) null else r.get(keyIdx, keyType)
    // pass A: (pid, nonEmpty, firstKey, lastKey, lastVal) where lastVal
    // is the last non-null fill among the TRAILING run of lastKey rows
    // (the only rows a later partition can continue from)
    val summaries = rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var firstKey: Any = null
      var curKey: Any = null
      var curVal: Any = null
      it.foreach { r =>
        val k = keyOf(r)
        if (!any) {
          any = true
          firstKey = InternalRow.copyValue(k)
          curKey = firstKey
        } else if (k != curKey) {
          curKey = InternalRow.copyValue(k); curVal = null
        }
        if (!r.isNullAt(fillIdx))
          curVal = InternalRow.copyValue(r.get(fillIdx, fillType))
      }
      Iterator.single((pid, any, firstKey, curKey, curVal))
    }.collect().sortBy(_._1)
    // driver: one forward pass, O(partitions). carries(p) = the
    // running value entering partition p (applies only to p's FIRST
    // key); resolved(q) = the running value at q's END for q's LAST
    // key. A partition continues the chain when the previous non-empty
    // partition's last key equals its first key; an all-null
    // whole-partition key run propagates its own carry-in, and a key
    // that began mid-partition with no non-null value resolves to null
    // (no earlier partition can hold it).
    val carries = Array.fill[Any](summaries.length)(null)
    val resolved = Array.fill[Any](summaries.length)(null)
    var prevIdx = -1
    summaries.foreach { case (pid, any, firstKey, lastKey, lastVal) =>
      if (any) {
        if (prevIdx >= 0 && summaries(prevIdx)._4 == firstKey)
          carries(pid) = resolved(prevIdx)
        resolved(pid) =
          if (lastVal != null) lastVal
          else if (firstKey == lastKey) carries(pid)
          else null
        prevIdx = pid
      }
    }
    val bc = session.sparkContext.broadcast(carries)
    // pass B: one streaming sweep per sorted partition, seeded from the
    // broadcast carry (which applies only until the first key changes).
    // Unfilled rows pass through as the plan's own rows; filled rows
    // are rebuilt as GenericInternalRows (fields other than the fill
    // still reference the live buffer — consumed before the next pull).
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first = true
      var curKey: Any = null
      var curVal: Any = bc.value(pid)
      it.map { r =>
        val k = keyOf(r)
        if (first) {
          first = false
          curKey = InternalRow.copyValue(k)
        } else if (k != curKey) {
          curKey = InternalRow.copyValue(k); curVal = null
        }
        if (!r.isNullAt(fillIdx)) {
          curVal = InternalRow.copyValue(r.get(fillIdx, fillType))
          r
        } else if (curVal == null) r
        else {
          val vals = new Array[Any](numFields)
          var i = 0
          while (i < numFields) {
            vals(i) = if (r.isNullAt(i)) null else r.get(i, fieldTypes(i))
            i += 1
          }
          vals(fillIdx) = curVal
          new GenericInternalRow(vals)
        }
      }
    }
    PlanShim.internalCreateDataFrame(session, filled, schema)
  }

  /** Bidirectional [[fill]] over ONE range shuffle: `fwdCol` fills with
    * the latest non-null value at-or-before each row in (key, order)
    * row order (exactly [[fill]]), and `bwdCol` fills with the NEXT
    * non-null value at-or-after it — the reverse-direction fill that
    * would otherwise cost a second range shuffle with the ordering
    * flipped. Callers that sweep one timeline in both directions
    * (closest's left/right candidates, reldist's flanking midpoints)
    * pay one range-boundary sampling job, one pass-A summary job, and
    * one shuffle instead of two of each.
    *
    * Scale shape: pass A additionally records each partition's LEADING
    * key run's first non-null `bwdCol` value; the driver resolves
    * backward carries with the mirror of the forward chain walk (still
    * O(partitions)). Pass B streams forward once: rows whose `bwdCol`
    * is null are buffered (copied) until the next non-null value of
    * their key arrives — or their key ends (no later value exists →
    * stays null), or the partition ends (the trailing run takes the
    * broadcast backward carry). Buffer memory is the longest gap
    * between consecutive non-null `bwdCol` values within one key — the
    * distance between adjacent reference rows on a timeline, NOT the
    * partition (a whole partition only when a key has no reference
    * rows at all).
    *
    * @param probeCol optional name of a BOOLEAN column: when set, only
    *                 rows where it is true ("probes") receive fills or
    *                 enter the pending buffer — every other row passes
    *                 through untouched as the plan's own live row (its
    *                 non-null fwd/bwd values still drive the running
    *                 state). Event-timeline callers whose reference
    *                 rows never consume a fill (closest, reldist) skip
    *                 one full-row copy per reference row this way. The
    *                 cost: with probeCol set, a partition's output may
    *                 interleave pass-through rows ahead of buffered
    *                 probes, so within-partition row ORDER is not
    *                 preserved (both callers filter + aggregate). */
  def fillBoth(df: DataFrame, key: String, fwdCol: String,
      bwdCol: String, order: Seq[Column], partitions: Int = 0,
      probeCol: Option[String] = None): DataFrame = {
    val session = df.sparkSession
    val n = if (partitions > 0) partitions
      else session.sessionState.conf.numShufflePartitions
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val fwdIdx = schema.fieldIndex(fwdCol)
    val bwdIdx = schema.fieldIndex(bwdCol)
    val probeIdx = probeCol.map { p =>
      require(schema(p).dataType ==
        org.apache.spark.sql.types.BooleanType,
        s"probeCol $p must be boolean, got " +
          schema(p).dataType.simpleString)
      schema.fieldIndex(p)
    }.getOrElse(-1)
    val fieldTypes = schema.fields.map(_.dataType)
    val keyType = fieldTypes(keyIdx)
    val fwdType = fieldTypes(fwdIdx)
    val bwdType = fieldTypes(bwdIdx)
    val numFields = fieldTypes.length
    val sortExprs = col(key).asc +: order
    val rdd = org.apache.spark.sql.graftshim.RangeShuffle
      .rangeSortedDf(df, sortExprs, Nil, n, adapt = partitions <= 0)
      .queryExecution.toRdd
    def keyOf(r: InternalRow): Any =
      if (r.isNullAt(keyIdx)) null else r.get(keyIdx, keyType)
    // pass A: fill()'s forward summary (firstKey, lastKey, lastFwdVal
    // of the trailing key run) plus the backward mirror: the FIRST
    // non-null bwd value among the LEADING run of firstKey rows (the
    // only rows an earlier partition can take its carry from)
    val summaries = rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var firstKey: Any = null
      var curKey: Any = null
      var curFwd: Any = null
      var leadBwd: Any = null
      var inLeading = true
      it.foreach { r =>
        val k = keyOf(r)
        if (!any) {
          any = true
          firstKey = InternalRow.copyValue(k)
          curKey = firstKey
        } else if (k != curKey) {
          curKey = InternalRow.copyValue(k); curFwd = null
          inLeading = false
        }
        if (!r.isNullAt(fwdIdx))
          curFwd = InternalRow.copyValue(r.get(fwdIdx, fwdType))
        if (inLeading && leadBwd == null && !r.isNullAt(bwdIdx))
          leadBwd = InternalRow.copyValue(r.get(bwdIdx, bwdType))
      }
      Iterator.single((pid, any, firstKey, curKey, curFwd, leadBwd))
    }.collect().sortBy(_._1)
    // forward carries: fill()'s chain walk verbatim
    val carriesF = Array.fill[Any](summaries.length)(null)
    val resolvedF = Array.fill[Any](summaries.length)(null)
    var prevIdx = -1
    summaries.foreach { case (pid, any, firstKey, lastKey, lastFwd, _) =>
      if (any) {
        if (prevIdx >= 0 && summaries(prevIdx)._4 == firstKey)
          carriesF(pid) = resolvedF(prevIdx)
        resolvedF(pid) =
          if (lastFwd != null) lastFwd
          else if (firstKey == lastKey) carriesF(pid)
          else null
        prevIdx = pid
      }
    }
    // backward carries: the mirror walk — carriesB(p) applies to p's
    // TRAILING lastKey run; a later partition continues the chain when
    // its first key equals this partition's last key
    val carriesB = Array.fill[Any](summaries.length)(null)
    val resolvedB = Array.fill[Any](summaries.length)(null)
    var nextIdx = -1
    summaries.reverseIterator.foreach {
      case (pid, any, firstKey, lastKey, _, leadBwd) =>
        if (any) {
          if (nextIdx >= 0 && summaries(nextIdx)._3 == lastKey)
            carriesB(pid) = resolvedB(nextIdx)
          resolvedB(pid) =
            if (leadBwd != null) leadBwd
            else if (firstKey == lastKey) carriesB(pid)
            else null
          nextIdx = pid
        }
    }
    val bcF = session.sparkContext.broadcast(carriesF)
    val bcB = session.sparkContext.broadcast(carriesB)
    // pass B: ONE forward stream per sorted partition. Forward fill as
    // fill(); backward fill buffers null-bwd rows (as detached field
    // arrays — the plan reuses its UnsafeRow buffer across pulls) until
    // their key's next non-null value, the key's end (stay null), or
    // the partition's end (broadcast carry).
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val bwdCarry = bcB.value(pid)
      new Iterator[InternalRow] {
        private val outQ =
          scala.collection.mutable.Queue.empty[InternalRow]
        private val pend =
          scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
        private var first = true
        private var curKey: Any = null
        private var curFwd: Any = bcF.value(pid)
        private var exhausted = false
        private def copyFields(r: InternalRow): Array[Any] = {
          val vals = new Array[Any](numFields)
          var i = 0
          while (i < numFields) {
            vals(i) =
              if (r.isNullAt(i)) null
              else InternalRow.copyValue(r.get(i, fieldTypes(i)))
            i += 1
          }
          vals
        }
        private def flushPend(bwdVal: Any): Unit = {
          pend.foreach { vals =>
            if (bwdVal != null) vals(bwdIdx) = bwdVal
            outQ.enqueue(new GenericInternalRow(vals))
          }
          pend.clear()
        }
        private def step(): Unit = {
          val r = it.next()
          val k = keyOf(r)
          if (first) {
            first = false
            curKey = InternalRow.copyValue(k)
          } else if (k != curKey) {
            curKey = InternalRow.copyValue(k); curFwd = null
            flushPend(null) // the old key ended: no later value exists
          }
          val fwdNull = r.isNullAt(fwdIdx)
          if (!fwdNull)
            curFwd = InternalRow.copyValue(r.get(fwdIdx, fwdType))
          val bwdNull = r.isNullAt(bwdIdx)
          if (!bwdNull) // a reference row: release everything waiting
            flushPend(InternalRow.copyValue(r.get(bwdIdx, bwdType)))
          val isProbe = probeIdx < 0 ||
            (!r.isNullAt(probeIdx) && r.getBoolean(probeIdx))
          if (!isProbe) {
            // pass-through: never filled, never buffered (live row —
            // safe because no further it.next() happens until the
            // queue drains)
            outQ.enqueue(r)
          } else if (bwdNull) {
            val vals = copyFields(r)
            if (fwdNull && curFwd != null) vals(fwdIdx) = curFwd
            pend += vals
          } else if (fwdNull && curFwd != null) {
            val vals = copyFields(r)
            vals(fwdIdx) = curFwd
            outQ.enqueue(new GenericInternalRow(vals))
          } else outQ.enqueue(r) // live buffer: dequeued before next pull
        }
        private def advance(): Unit = {
          while (outQ.isEmpty && !exhausted) {
            if (it.hasNext) step()
            else {
              exhausted = true
              flushPend(bwdCarry) // trailing run: later partitions' value
            }
          }
        }
        def hasNext: Boolean = { advance(); outQ.nonEmpty }
        def next(): InternalRow = { advance(); outQ.dequeue() }
      }
    }
    PlanShim.internalCreateDataFrame(session, filled, schema)
  }

  /** K-deep [[fillBoth]]: instead of ONE value per direction, every
    * probe row receives the last `k` non-null `fwdCol` values
    * at-or-before it (most-recent-first) and the next `k` non-null
    * `bwdCol` values at-or-after it (earliest-first), as two NEW array
    * columns appended to the schema (`outFwd`, `outBwd`) — the
    * "as-of join with k matches" primitive under
    * [[IntervalOps.closestK]]'s bedtools `closest -k` analogue.
    * Rows where `probeCol` is false/absent pass through with null
    * arrays (their non-null fwd/bwd values still drive the running
    * state). A row's OWN non-null value is included in its fill, both
    * directions — [[fillBoth]]'s inclusive at-or-before / at-or-after
    * contract.
    *
    * Scale shape — identical to [[fillBoth]]: ONE range shuffle on
    * (key, ordering); pass A summarizes each sorted partition into the
    * trailing key run's last ≤k fwd values and the leading run's first
    * ≤k bwd values; the driver chain walk concatenates deques across
    * partitions of one key and caps at k — O(partitions × k) driver
    * state. Pass B streams forward once keeping a k-deep deque; probes
    * awaiting backward values buffer until k values arrive, their key
    * ends, or the partition ends (broadcast carry tops up). Buffer
    * memory is k × the gap between reference rows, not the partition.
    *
    * Within-partition output ORDER is not preserved (buffered probes
    * flush behind pass-through rows) — callers filter + aggregate,
    * exactly [[fillBoth]]'s probeCol contract. */
  def fillBothK(df: DataFrame, key: String, fwdCol: String,
      bwdCol: String, outFwd: String, outBwd: String, k: Int,
      order: Seq[Column], partitions: Int = 0,
      probeCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"fillBothK needs k >= 1, got $k")
    val session = df.sparkSession
    val n = if (partitions > 0) partitions
      else session.sessionState.conf.numShufflePartitions
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val fwdIdx = schema.fieldIndex(fwdCol)
    val bwdIdx = schema.fieldIndex(bwdCol)
    val probeIdx = probeCol.map { p =>
      require(schema(p).dataType ==
        org.apache.spark.sql.types.BooleanType,
        s"probeCol $p must be boolean, got " +
          schema(p).dataType.simpleString)
      schema.fieldIndex(p)
    }.getOrElse(-1)
    val fieldTypes = schema.fields.map(_.dataType)
    val keyType = fieldTypes(keyIdx)
    val fwdType = fieldTypes(fwdIdx)
    val bwdType = fieldTypes(bwdIdx)
    val numFields = fieldTypes.length
    val sortExprs = col(key).asc +: order
    val rdd = org.apache.spark.sql.graftshim.RangeShuffle
      .rangeSortedDf(df, sortExprs, Nil, n, adapt = partitions <= 0)
      .queryExecution.toRdd
    def keyOf(r: InternalRow): Any =
      if (r.isNullAt(keyIdx)) null else r.get(keyIdx, keyType)
    // pass A: the k-deep mirror of fillBoth's summary — trailing run's
    // last ≤k fwd values (most-recent-first) and leading run's first
    // ≤k bwd values (earliest-first)
    val summaries = rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var firstKey: Any = null
      var curKey: Any = null
      val tailFwd = scala.collection.mutable.ArrayDeque.empty[Any]
      val leadBwd = scala.collection.mutable.ArrayBuffer.empty[Any]
      var inLeading = true
      it.foreach { r =>
        val kv = keyOf(r)
        if (!any) {
          any = true
          firstKey = InternalRow.copyValue(kv)
          curKey = firstKey
        } else if (kv != curKey) {
          curKey = InternalRow.copyValue(kv); tailFwd.clear()
          inLeading = false
        }
        if (!r.isNullAt(fwdIdx)) {
          tailFwd.prepend(InternalRow.copyValue(r.get(fwdIdx, fwdType)))
          if (tailFwd.length > k) tailFwd.remove(k)
        }
        if (inLeading && leadBwd.length < k && !r.isNullAt(bwdIdx))
          leadBwd += InternalRow.copyValue(r.get(bwdIdx, bwdType))
      }
      Iterator.single((pid, any, firstKey, curKey, tailFwd.toList,
        leadBwd.toList))
    }.collect().sortBy(_._1)
    // forward chain walk (fill()'s, list-valued): a single-key
    // partition continues its predecessor's resolved deque
    val carriesF = Array.fill[List[Any]](summaries.length)(Nil)
    val resolvedF = Array.fill[List[Any]](summaries.length)(Nil)
    var prevIdx = -1
    summaries.foreach { case (pid, any, firstKey, lastKey, tailF, _) =>
      if (any) {
        if (prevIdx >= 0 && summaries(prevIdx)._4 == firstKey)
          carriesF(pid) = resolvedF(prevIdx)
        resolvedF(pid) =
          (tailF ++ (if (firstKey == lastKey) carriesF(pid) else Nil))
            .take(k)
        prevIdx = pid
      }
    }
    // backward mirror: earliest-first lists, appended from later
    // partitions of the same key
    val carriesB = Array.fill[List[Any]](summaries.length)(Nil)
    val resolvedB = Array.fill[List[Any]](summaries.length)(Nil)
    var nextIdx = -1
    summaries.reverseIterator.foreach {
      case (pid, any, firstKey, lastKey, _, leadB) =>
        if (any) {
          if (nextIdx >= 0 && summaries(nextIdx)._3 == lastKey)
            carriesB(pid) = resolvedB(nextIdx)
          resolvedB(pid) =
            (leadB ++ (if (firstKey == lastKey) carriesB(pid) else Nil))
              .take(k)
          nextIdx = pid
        }
    }
    val bcF = session.sparkContext.broadcast(carriesF)
    val bcB = session.sparkContext.broadcast(carriesB)
    val outSchema = schema
      .add(outFwd, org.apache.spark.sql.types.ArrayType(fwdType))
      .add(outBwd, org.apache.spark.sql.types.ArrayType(bwdType))
    // pass B: one forward stream; every row is rebuilt (the schema
    // widens by two fields, so UnsafeRow pass-through is impossible)
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val bwdCarry = bcB.value(pid)
      new Iterator[InternalRow] {
        private val outQ =
          scala.collection.mutable.Queue.empty[InternalRow]
        // pending probes: field copies + the backward values collected
        // so far (earliest-first)
        private val pend = scala.collection.mutable.ArrayBuffer
          .empty[(Array[Any], scala.collection.mutable.ArrayBuffer[Any])]
        private val deque =
          scala.collection.mutable.ArrayDeque.empty[Any]
        private var first = true
        private var curKey: Any = null
        private var exhausted = false
        deque.appendAll(bcF.value(pid))
        private def copyFields(r: InternalRow): Array[Any] = {
          val vals = new Array[Any](numFields + 2)
          var i = 0
          while (i < numFields) {
            vals(i) =
              if (r.isNullAt(i)) null
              else InternalRow.copyValue(r.get(i, fieldTypes(i)))
            i += 1
          }
          vals
        }
        private def emit(vals: Array[Any],
            bwd: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
          vals(numFields + 1) =
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              bwd.toArray)
          outQ.enqueue(new GenericInternalRow(vals))
        }
        private def flushPendAll(
            carry: List[Any]): Unit = {
          pend.foreach { case (vals, buf) =>
            carry.iterator.takeWhile(_ => buf.length < k)
              .foreach(buf += _)
            emit(vals, buf)
          }
          pend.clear()
        }
        private def onBwdValue(v: Any): Unit = {
          var i = 0
          while (i < pend.length) {
            pend(i)._2 += v
            i += 1
          }
          val (done, wait) = pend.partition(_._2.length >= k)
          done.foreach { case (vals, buf) => emit(vals, buf) }
          pend.clear(); pend ++= wait
        }
        private def step(): Unit = {
          val r = it.next()
          val kv = keyOf(r)
          if (first) {
            first = false
            curKey = InternalRow.copyValue(kv)
          } else if (kv != curKey) {
            curKey = InternalRow.copyValue(kv)
            deque.clear()
            flushPendAll(Nil) // the old key ended: no later values
          }
          if (!r.isNullAt(fwdIdx)) {
            deque.prepend(InternalRow.copyValue(r.get(fwdIdx, fwdType)))
            if (deque.length > k) deque.remove(k)
          }
          val bwdNull = r.isNullAt(bwdIdx)
          val bwdVal =
            if (bwdNull) null
            else InternalRow.copyValue(r.get(bwdIdx, bwdType))
          val isProbe = probeIdx < 0 ||
            (!r.isNullAt(probeIdx) && r.getBoolean(probeIdx))
          if (isProbe) {
            val vals = copyFields(r)
            vals(numFields) =
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                deque.toArray)
            // enqueued with an empty buffer BEFORE onBwdValue runs, so
            // a probe that is also a reference row collects its own
            // value exactly once (the inclusive at-or-after contract)
            pend += ((vals,
              scala.collection.mutable.ArrayBuffer.empty[Any]))
          } else {
            val vals = copyFields(r)
            vals(numFields) = null
            vals(numFields + 1) = null
            outQ.enqueue(new GenericInternalRow(vals))
          }
          if (!bwdNull) onBwdValue(bwdVal)
        }
        private def advance(): Unit = {
          while (outQ.isEmpty && !exhausted) {
            if (it.hasNext) step()
            else {
              exhausted = true
              flushPendAll(bwdCarry)
            }
          }
        }
        def hasNext: Boolean = { advance(); outQ.nonEmpty }
        def next(): InternalRow = { advance(); outQ.dequeue() }
      }
    }
    PlanShim.internalCreateDataFrame(session, filled, outSchema)
  }
}
