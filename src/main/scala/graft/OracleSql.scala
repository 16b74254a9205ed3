package graft

/** DuckDB oracle SQL — one statement per entry in [[SparkEntry.queries]],
  * semantically identical (same derivations, same rounding, same ORDER BY,
  * same column names). Kept in one place so the shared constants (interval
  * derivations, minhash family, marker vocabularies) are visibly in sync
  * with the Scala operators.
  */
object OracleSql {

  /** Derived interval CTEs shared by the genomic queries — must mirror
    * SparkEntry.intervalsA/intervalsB exactly. */
  private val ivA =
    """SELECT l_orderkey*10 + l_linenumber AS iv_id,
      | 'chr' || (l_orderkey % 4) AS chrom,
      | (l_partkey*12347) % 10000000 AS start,
      | (l_partkey*12347) % 10000000 + 50 + CAST(floor(l_quantity) AS BIGINT)*10 AS "end"
      |FROM lineitem""".stripMargin
  /** Shared coverage-segment CTEs (gates q74/q78): net breakpoints of
    * the lineitem-derived interval set, then the per-chromosome window
    * prefix sum whose skew the distributed sweep replaces. */
  private def coverageSegCtes: String =
    s"""WITH iva AS ($ivA),
       |ev AS (SELECT chrom, "start" AS pos, 1 AS d FROM iva
       |  UNION ALL
       |  SELECT chrom, greatest("end", "start"), -1 FROM iva),
       |bp AS (SELECT chrom, pos, CAST(sum(d) AS BIGINT) AS d
       |  FROM ev GROUP BY 1, 2 HAVING sum(d) <> 0),
       |seg AS (SELECT chrom, pos AS seg_start,
       |    lead(pos) OVER (PARTITION BY chrom ORDER BY pos)
       |      AS seg_end,
       |    CAST(sum(d) OVER (PARTITION BY chrom ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS depth
       |  FROM bp)""".stripMargin

  private val ivB =
    """SELECT o_orderkey AS iv_id,
      | 'chr' || (o_orderkey % 4) AS chrom,
      | (o_custkey*9973) % 10000000 AS start,
      | (o_custkey*9973) % 10000000 + 200 AS "end"
      |FROM orders""".stripMargin

  /** Mirrors SparkEntry.intervalsC (the customer-derived probe side of
    * the q77/q79/q83/q85-q87 bedtools gates). */
  private val ivC =
    """SELECT c_custkey AS aid,
      | 'chr' || (c_custkey % 4) AS chrom,
      | (c_custkey*5557) % 10000000 AS astart,
      | (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
      |FROM customer""".stripMargin

  /** Mirrors SparkEntry.intervalsCS / intervalsBS: the stranded-gate
    * derivations — thirds of '+' / '-' / '.' keyed off the id, so
    * both engines derive the strand with one CASE expression. */
  private val ivCS =
    s"""SELECT *,
       | CASE WHEN aid % 3 = 0 THEN '+'
       |   WHEN aid % 3 = 1 THEN '-' ELSE '.' END AS strand
       |FROM ($ivC)""".stripMargin

  private val ivBS =
    s"""SELECT *,
       | CASE WHEN iv_id % 3 = 0 THEN '+'
       |   WHEN iv_id % 3 = 1 THEN '-' ELSE '.' END AS strand
       |FROM ($ivB)""".stripMargin

  /** The q36-style gaps-and-islands merge, parameterized by the source
    * CTE name — shared by the q84 jaccard oracle, which replays BOTH
    * sides' merges with the textbook per-chromosome windows that
    * [[graft.operators.IntervalOps.mergeIntervalsRange]] replaces.
    * The DISTINCT head is load-bearing: the two ROWS-framed windows
    * order ties ARBITRARILY, so with duplicate (start, end) rows a
    * duplicate can land before its island's new_grp=1 carrier in the
    * second window's order and fuse two islands (observed on the ivB
    * set, 1500 rows / 544 distinct). Duplicates never change a union,
    * and distinct rows make both orders total, hence deterministic. */
  private def mergeCtes(src: String, pfx: String): String =
    s"""${pfx}d AS (SELECT DISTINCT chrom, "start", "end" FROM $src),
       |${pfx}g AS (
       |  SELECT chrom, "start", "end",
       |    CASE WHEN max(greatest("end", "start")) OVER w IS NULL
       |           OR "start" > max(greatest("end", "start")) OVER w
       |         THEN 1 ELSE 0 END AS new_grp
       |  FROM ${pfx}d
       |  WINDOW w AS (PARTITION BY chrom ORDER BY "start", "end"
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |${pfx}h AS (
       |  SELECT chrom, "start", "end",
       |    sum(new_grp) OVER (PARTITION BY chrom ORDER BY "start", "end"
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM ${pfx}g),
       |${pfx}m AS (
       |  SELECT chrom, min("start") AS ms,
       |    max(greatest("end", "start")) AS me
       |  FROM ${pfx}h GROUP BY chrom, grp)""".stripMargin

  /** Minhash/shingle CTE fragments (mirror TextOps constants). */
  private val shingleCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |sh AS (SELECT doc_id,
      |  unnest([array_to_string(words[i:i+2], ' ')
      |          for i in generate_series(1, greatest(len(words)-2, 1))]) AS sh
      |  FROM w),
      |h AS (SELECT doc_id, CAST(('0x' || substr(md5(sh),1,8)) AS BIGINT) AS h FROM sh)""".stripMargin

  private val sigCte =
    s"""$shingleCte,
       |sig AS (SELECT doc_id,
       |  min((h*712371 + 136607) % 2038074743) AS s0,
       |  min((h*431071 + 982451) % 2038074743) AS s1,
       |  min((h*280081 + 276037) % 2038074743) AS s2,
       |  min((h*918209 + 661619) % 2038074743) AS s3,
       |  min((h*160289 + 104729) % 2038074743) AS s4,
       |  min((h*555601 + 870967) % 2038074743) AS s5,
       |  min((h*997813 + 350377) % 2038074743) AS s6,
       |  min((h*331777 + 490019) % 2038074743) AS s7
       | FROM h GROUP BY doc_id)""".stripMargin

  private val bandCte =
    s"""$sigCte,
       |band AS (SELECT doc_id, t.b,
       |  CASE t.b WHEN 0 THEN s0 || '_' || s1
       |           WHEN 1 THEN s2 || '_' || s3
       |           WHEN 2 THEN s4 || '_' || s5
       |           ELSE s6 || '_' || s7 END AS key
       | FROM sig, (SELECT unnest([0,1,2,3]) AS b) t)""".stripMargin

  private val pairCte =
    s"""$bandCte,
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM band a JOIN band b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Embedding norm + double-precision dot product CTE. */
  private val embCte =
    """e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in embedding])) AS nrm
      | FROM embeddings)""".stripMargin

  private def dot(a: String, b: String): String =
    s"list_sum([CAST($a.embedding[i] AS DOUBLE)*CAST($b.embedding[i] AS DOUBLE) " +
      s"for i in generate_series(1, len($a.embedding))])"

  /** Seeded-hyperplane LSH bucket mirroring
    * [[graft.operators.Similarity.hyperplaneBucket]] bit-for-bit: the
    * integer-quantized planes print exactly, and `list_reduce` reproduces
    * Spark's left-to-right double accumulation, so bucket assignment is
    * identical across engines. `vecExpr[j]` is cast to DOUBLE like Spark's
    * `x.cast("double")`. */
  private def hpBucketSql(vecExpr: String, bits: Int, seed: Long): String = {
    val planes = graft.operators.Similarity.intPlanes(seed, bits, 64)
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_reduce(list_transform(range(1,65), " +
        s"j -> CAST($vecExpr[j] AS DOUBLE) * " +
        s"(${p.mkString("[", ",", "]")}::DOUBLE[])[j]), (a,x) -> a+x) > 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("CAST((", "\n + ", ") AS BIGINT)")
  }

  private val hpBucket6 = hpBucketSql("embedding", 6, 42L)

  private val enStop = "('the','and','of','to','is','a')"

  /** Transitive-closure clustering oracle shared by q37 (min-label
    * propagation) and q40 (star contraction) — one definition so the
    * two gates can never drift apart. */
  /** Shared by q34 (full decode) and q61 (header-only): both gates
    * assert the same analytic dims over the same corpus. */
  private def mediaDimsSql: String =
    """WITH d AS (SELECT doc_id,
      |  octet_length(encode(text)) AS nb FROM documents)
      |SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png'
      |            ELSE 'image/jpeg' END AS mime,
      | CAST(nb % 64 + 1 AS BIGINT) AS width,
      | CAST(nb % 48 + 1 AS BIGINT) AS height,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS BIGINT)
      |   AS n_channels,
      | CAST(8 AS BIGINT) AS bit_depth,
      | count(*) AS n_assets
      |FROM d GROUP BY 1, 2, 3, 4, 5 ORDER BY mime, width, height""".stripMargin

  private def dedupClosureSql: String =
    s"""WITH RECURSIVE $pairCte,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT doc_id, cluster_id FROM lab ORDER BY doc_id""".stripMargin

  val all: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q04_broadcast_part" ->
      """SELECT p_brand, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_window_topn" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey
        |                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q06_setops" ->
      """SELECT o_custkey, 'both' AS op FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT o_custkey, 'only95' AS op FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |ORDER BY op, o_custkey""".stripMargin,

    "q07_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY 1, 2""".stripMargin,

    "q08_semi_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_anti_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q11_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type, count(*) AS n_events,
        | round(sum(value), 2) AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    // NULLS FIRST matches Spark's ASC default — DuckDB defaults to nulls
    // last, which would sessionize null-ts rows differently the day the
    // events corpus plants them (q42 filters them; this window gate
    // must instead ORDER identically)
    "q12_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |m AS (SELECT user_id,
        |  CASE WHEN lag(tus) OVER w IS NULL THEN 1
        |       WHEN tus - lag(tus) OVER w > 1800*1000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM t WINDOW w AS (PARTITION BY user_id
        |   ORDER BY tus NULLS FIRST, event_id))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_asof_join" ->
      """SELECT user_id, count(*) AS n_matched,
        | round(sum(o_totalprice), 2) AS sum_matched_price
        |FROM (SELECT e.user_id, o.o_totalprice,
        |       row_number() OVER (PARTITION BY e.event_id
        |         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |      FROM events e JOIN orders o
        |        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_interval_join" ->
      s"""WITH iva AS ($ivA), ivb AS ($ivB)
         |SELECT a.chrom, count(*) AS n_pairs,
         | CAST(sum(least(a."end", b."end") - greatest(a.start, b.start)) AS BIGINT)
         |   AS sum_overlap
         |FROM iva a JOIN ivb b
         |  ON a.chrom = b.chrom AND a.start < b."end" AND b.start < a."end"
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_parse_region" ->
      s"""WITH ivb AS ($ivB)
         |SELECT chrom, count(*) AS n_regions,
         | CAST(sum("end" - start) AS BIGINT) AS sum_span,
         | min(start) AS min_start, max("end") AS max_end
         |FROM ivb GROUP BY 1 ORDER BY 1""".stripMargin,

    // q16: CLIPPED per-base zoom semantics — the oracle explodes each
    // interval into the bins it overlaps (lateral generate_series) and
    // splits covered bases at bin boundaries, mirroring the operator's
    // explode(sequence(...)) exactly. v is integral so the double sums
    // are exact and the BIGINT casts deterministic.
    "q16_zoom_rollup" ->
      """WITH iva AS (
        |  SELECT 'chr' || (l_orderkey % 4) AS chrom,
        |    (l_partkey*12347) % 10000000 AS start,
        |    (l_partkey*12347) % 10000000 + 50
        |      + CAST(floor(l_quantity) AS BIGINT)*10 AS "end",
        |    CAST(floor(l_quantity) AS DOUBLE) AS v
        |  FROM lineitem),
        |b AS (
        |  SELECT chrom, start, "end", v,
        |    unnest(range(start // 100000, ("end"-1) // 100000 + 1))
        |      AS bin
        |  FROM iva),
        |c AS (
        |  SELECT chrom, bin, v,
        |    LEAST("end", (bin+1)*100000) - GREATEST(start, bin*100000)
        |      AS covered
        |  FROM b)
        |SELECT chrom, CAST(bin*100000 AS BIGINT) AS bin_start,
        |  count(*) AS n_records,
        |  CAST(sum(covered) AS BIGINT) AS bases_covered,
        |  min(v) AS min_val, max(v) AS max_val,
        |  CAST(sum(v * covered) AS BIGINT) AS sum_val,
        |  CAST(sum(v * v * covered) AS BIGINT) AS sum_squares
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q17_flagstat" ->
      """SELECT count(*) AS n_total,
        | CAST(sum(CASE WHEN (flag & 1) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
        | CAST(sum(CASE WHEN (flag & 2) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_proper,
        | CAST(sum(CASE WHEN (flag & 4) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmapped,
        | CAST(sum(CASE WHEN (flag & 16) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reverse,
        | CAST(sum(CASE WHEN (flag & 256) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_secondary,
        | CAST(sum(CASE WHEN (flag & 1024) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate
        |FROM (SELECT CAST(l_orderkey % 4096 AS INTEGER) AS flag FROM lineitem) t""".stripMargin,

    "q18_cigar" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(floor(l_quantity) AS BIGINT) + (l_suppkey % 7)) AS BIGINT)
        |   AS sum_ref_len,
        | CAST(sum(3) AS BIGINT) AS sum_ops, count(*) AS n_records
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | round(avg(length(text)), 4) AS avg_chars,
        | round(avg((CAST(length(text) AS DOUBLE) - (len(string_split(text,' ')) - 1))
        |           / CAST(len(string_split(text,' ')) AS DOUBLE)), 4) AS avg_word_len
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_quality" ->
      s"""WITH t AS (SELECT source, string_split(text, ' ') AS ws,
         |  CAST(length(text) AS DOUBLE) AS chars FROM documents),
         |q AS (SELECT source,
         |  least(len(ws)/100.0, 1.0) * 0.25
         |  + (CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws)) * 0.25
         |  + (1.0 - abs(CAST(len(list_filter(ws, w -> w IN $enStop)) AS DOUBLE)
         |               /len(ws) - 0.4)) * 0.25
         |  + least(((chars - (len(ws)-1))/len(ws))/8.0, 1.0) * 0.25 AS q
         | FROM t)
         |SELECT source, count(*) AS n_docs, round(avg(q), 4) AS avg_quality,
         | CAST(sum(CASE WHEN q > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_langid" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
         |sc AS (SELECT lang,
         |  len(list_filter(ws, w -> w IN $enStop)) AS s_en,
         |  len(list_filter(ws, w -> w IN ('der','die','und','das','ist','ein'))) AS s_de,
         |  len(list_filter(ws, w -> w IN ('el','los','las','de','y','es'))) AS s_es,
         |  len(list_filter(ws, w -> w IN ('le','la','les','et','est','un'))) AS s_fr
         | FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
         |       WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS predicted
         | FROM sc)
         |SELECT lang, predicted, count(*) AS n_docs FROM p
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q22_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q23_minhash_sig" ->
      s"""WITH $sigCte
         |SELECT doc_id, s0, s1, s2, s3, s4, s5, s6, s7 FROM sig
         |ORDER BY doc_id""".stripMargin,

    "q24_neardup_pairs" ->
      s"""WITH $pairCte
         |SELECT id_a, id_b FROM pairs ORDER BY 1, 2""".stripMargin,

    "q25_simhash" ->
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents),
         |h AS (SELECT doc_id, CAST(('0x' || substr(md5(word),1,8)) AS BIGINT) AS h
         |  FROM w),
         |v AS (SELECT doc_id,
         |${(0 until 16).map(b =>
             s"  sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
             .mkString(",\n")}
         | FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST(${(0 until 16).map(b =>
             s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")}
         |  AS BIGINT) AS simhash
         |FROM v ORDER BY doc_id""".stripMargin,

    "q26_ngram_jaccard" ->
      s"""WITH $pairCte,
         |shl AS (SELECT doc_id,
         |  [array_to_string(words[i:i+2], ' ')
         |   for i in generate_series(1, greatest(len(words)-2, 1))] AS sh
         | FROM w)
         |SELECT p.id_a, p.id_b,
         | round(CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
         |       / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM pairs p
         | JOIN shl a ON p.id_a = a.doc_id
         | JOIN shl b ON p.id_b = b.doc_id
         |ORDER BY 1, 2""".stripMargin,

    "q27_cosine_topk" ->
      s"""WITH $embCte,
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  round(${dot("q", "c")} / (q.nrm * c.nrm), 6) AS sim
         | FROM e q, e c WHERE q.vec_id < 8 AND c.vec_id >= 8),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, cand_id) AS BIGINT) AS rank FROM p)
         |SELECT query_id, rank, cand_id, sim FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q28_ann_bucket" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, embedding, nrm, $hpBucket6 AS bucket FROM e),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket,
         |  round(${dot("q", "c")} / (q.nrm * c.nrm), 6) AS sim
         | FROM b q JOIN b c ON q.bucket = c.bucket
         | WHERE q.vec_id < 16 AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, cand_id) AS BIGINT) AS rank FROM p)
         |SELECT query_id, rank, cand_id, sim, bucket FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q29_embed_neardup" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, embedding, nrm, $hpBucket6 AS bucket FROM e),
         |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |  round(${dot("a", "c")} / (a.nrm * c.nrm), 6) AS sim
         | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.25 ORDER BY 1, 2""".stripMargin,

    "q30_multimodal_meta" ->
      """SELECT source, count(*) AS n_assets,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | count(DISTINCT md5(text)) AS n_distinct_payloads
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_token_regex" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        | CAST(sum(len(regexp_extract_all(text,
        |   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_winnow" ->
      """WITH g AS (SELECT source,
        |  list_transform(range(1, greatest(length(text)-7, 1)+1),
        |    i -> CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
        |      1, 8)) AS BIGINT)) AS hs
        |  FROM documents),
        |w AS (SELECT source,
        |  list_distinct(list_transform(range(1, greatest(len(hs)-3, 1)+1),
        |    i -> list_min(hs[CAST(i AS INT):CAST(i+3 AS INT)]))) AS fp
        |  FROM g)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(len(fp)) AS BIGINT) AS n_fps,
        | CAST(sum(list_aggregate(fp, 'sum')) AS BIGINT) AS fp_checksum
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_ann_banded" -> q33Sql,

    // Analytic mirror of q34: the Spark side BUILDS real PNG/JPEG bytes
    // and PARSES the dims back via MediaDecoder; the oracle recomputes the
    // dims directly from the text length, so builder/parser offset bugs
    // surface as a mismatch.
    "q34_media_dims" -> mediaDimsSql,

    // q61: q34's corpus through the header-only extractDims path — the
    // SAME oracle string (one val, like the shared Spark-side rollup and
    // dedupClosureSql), so full-decode and header-only gates can never
    // desynchronize
    "q61_media_dims_hdr" -> mediaDimsSql,

    // q35: the streaming windowed aggregation's final table must equal
    // the plain batch aggregation — same grouping as q11 minus the
    // distinct-user count (not expressible in a streaming aggregate)
    "q35_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |   AS hour_start,
        | event_type, count(*) AS n_events,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    // q36: bedtools-merge via the identical running-max window sweep
    "q36_merge_intervals" ->
      """WITH iv AS (
        |  SELECT 'chr' || CAST(o_orderkey % 4 AS VARCHAR) AS chrom,
        |         CAST((o_custkey * 7919) % 10000000 AS BIGINT) AS "start",
        |         CAST((o_custkey * 7919) % 10000000 + 40 + o_orderkey % 4000
        |           AS BIGINT) AS "end"
        |  FROM orders),
        |g AS (
        |  SELECT chrom, "start", "end",
        |    CASE WHEN max(greatest("end", "start")) OVER w IS NULL
        |           OR "start" > max(greatest("end", "start")) OVER w
        |         THEN 1 ELSE 0 END AS new_grp
        |  FROM iv
        |  WINDOW w AS (PARTITION BY chrom ORDER BY "start", "end"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |h AS (
        |  SELECT chrom, "start", "end",
        |    sum(new_grp) OVER (PARTITION BY chrom ORDER BY "start", "end"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM g)
        |SELECT chrom, min("start") AS "start",
        |  max(greatest("end", "start")) AS "end", count(*) AS n_merged
        |FROM h GROUP BY chrom, grp ORDER BY chrom, "start"""".stripMargin,

    // q104: bedtools merge -d 500 — q36's gaps-and-islands windows
    // with the same 500-base slack in the new-group rule
    "q104_merge_gap" ->
      """WITH iv AS (
        |  SELECT 'chr' || CAST(o_orderkey % 4 AS VARCHAR) AS chrom,
        |         CAST((o_custkey * 7919) % 10000000 AS BIGINT) AS "start",
        |         CAST((o_custkey * 7919) % 10000000 + 40 + o_orderkey % 4000
        |           AS BIGINT) AS "end"
        |  FROM orders),
        |g AS (
        |  SELECT chrom, "start", "end",
        |    CASE WHEN max(greatest("end", "start")) OVER w IS NULL
        |           OR "start" > max(greatest("end", "start")) OVER w + 500
        |         THEN 1 ELSE 0 END AS new_grp
        |  FROM iv
        |  WINDOW w AS (PARTITION BY chrom ORDER BY "start", "end"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |h AS (
        |  SELECT chrom, "start", "end",
        |    sum(new_grp) OVER (PARTITION BY chrom ORDER BY "start", "end"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM g)
        |SELECT chrom, min("start") AS "start",
        |  max(greatest("end", "start")) AS "end", count(*) AS n_merged
        |FROM h GROUP BY chrom, grp ORDER BY chrom, "start"""".stripMargin,
    // q105: bedtools intersect -u / -v — EXISTS / NOT EXISTS over the
    // raw strict-overlap predicate, tagged and unioned
    "q105_overlap_filter" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB)
         |SELECT 'u' AS mode, aid, chrom,
         |  CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end"
         |FROM a WHERE EXISTS (SELECT 1 FROM bv b
         |  WHERE b.chrom = a.chrom AND a.astart < b."end"
         |    AND b."start" < a.aend)
         |UNION ALL
         |SELECT 'v' AS mode, aid, chrom,
         |  CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end"
         |FROM a WHERE NOT EXISTS (SELECT 1 FROM bv b
         |  WHERE b.chrom = a.chrom AND a.astart < b."end"
         |    AND b."start" < a.aend)
         |ORDER BY mode, aid""".stripMargin,

    // q37: connected components of the LSH pair graph via a recursive
    // transitive-closure CTE — every node labeled with the smallest
    // reachable id, mirroring TextOps.dedupClusters' fixpoint
    "q37_dedup_clusters" ->
      dedupClosureSql,

    // q50: the same pair closure, every doc labeled (self if unpaired),
    // then the q43 md5-bucket split applied to the CLUSTER id
    "q50_leakage_split" ->
      s"""WITH RECURSIVE $pairCte,
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |alldocs AS (SELECT d.doc_id,
         |  COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         |b AS (SELECT doc_id, cluster_id,
         |  CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),1,8))
         |    AS BIGINT) % 1000 AS bucket FROM alldocs)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bucket < 800 THEN 'train'
         |       WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    // q41: IVF mirrored bit-for-bit — same left-fold dots/norms, same
    // deterministic seed-vector quantizer, same tie-breaks
    "q41_ann_ivf" -> q41Sql,

    // q45: banded-LSH embedding dedup mirrored end to end — same planted
    // corpus, same band keys, same rounded cosine, same closure
    "q45_embed_dedup" -> q45Sql,

    // q51: deterministic PII augmentation, counts, and redacted-byte
    // checksum — patterns interpolated from the TextOps constants
    "q51_pii_redact" -> q51Sql,

    // q52: paragraph-level exact dedup over the planted partial copies
    "q52_para_dedup" -> q52Sql,

    // q53: the fixed-point Lloyd loop replayed exactly in SQL
    "q53_kmeans" -> q53Sql,
    // q55: the same loop with the production SEEDED init — the
    // xxhash64 draw replayed bit-exactly in HUGEINT arithmetic
    "q55_kmeans_seeded" -> q55Sql,
    // q65: trained-quantizer IVF — the q53 training chain's centroids
    // driving the q41-shaped assignment/probe/rerank
    "q65_ann_ivf_trained" -> q65Sql,
    // q66: IVF-PQ — coarse route + per-block trained codebooks +
    // exact-long ADC scan + exact rerank, all replayed
    "q66_ann_ivfpq" -> q66Sql,
    // q67: stratified sampling — the exact kept set via xxhash replay
    "q67_sample_stratified" -> q67Sql,
    // q68/q69: BM25 ranking and BM25+cosine RRF hybrid search
    "q68_bm25" -> q68Sql,
    "q69_rrf_hybrid" -> q69Sql,
    // q70: exact histogram-method token percentiles per source
    "q70_corpus_profile" -> q70Sql,
    // q72: residual IVFADC — the q66 replay in per-cell residual frame
    "q72_ann_ivfadc" -> q72Sql,
    // q73: trained-coarse residual IVFADC — the faithful composition
    "q73_ann_ivfadc_trained" -> q73Sql,
    // q74: coverage histogram — the textbook per-chrom window prefix
    // sum over net breakpoints (the formulation whose one-task-per-
    // contig skew IntervalOps.coverage's two-pass sweep replaces)
    "q74_coverage" ->
      s"""$coverageSegCtes
         |SELECT chrom, depth, count(*) AS n_segs,
         |  CAST(sum(seg_end - seg_start) AS BIGINT) AS bases,
         |  CAST(sum(seg_start) AS BIGINT) AS sum_start
         |FROM seg WHERE seg_end IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q79: bedtools-subtract — maximally independent per-base replay:
    // explode A to positions, drop covered ones, re-coalesce with a
    // gaps-and-islands window (the oracle may be per-base; the engine
    // must not be)
    "q79_subtract" ->
      s"""WITH a AS (SELECT c_custkey AS aid,
         |    'chr' || (c_custkey % 4) AS chrom,
         |    (c_custkey*5557) % 10000000 AS astart,
         |    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300
         |      AS aend
         |  FROM customer),
         |bv AS ($ivB),
         |pos AS (SELECT aid, chrom, unnest(range(astart, aend)) AS p
         |  FROM a),
         |alive AS (SELECT aid, chrom, p FROM pos
         |  WHERE NOT EXISTS (SELECT 1 FROM bv b
         |    WHERE b.chrom = pos.chrom
         |      AND b."start" <= pos.p AND pos.p < b."end")),
         |isl AS (SELECT aid, chrom, p,
         |    p - row_number() OVER (PARTITION BY aid ORDER BY p)
         |      AS grp
         |  FROM alive)
         |SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
         |  CAST(max(p) + 1 AS BIGINT) AS "end"
         |FROM isl GROUP BY aid, chrom, grp
         |ORDER BY aid, "start"""".stripMargin,
    // q78: bedtools-complement — q74's segments filtered to depth 0
    // (IntervalOps.complement is literally coverage().where(depth=0),
    // and the oracle shares the same CTEs, so they cannot drift)
    "q78_complement" ->
      s"""$coverageSegCtes
         |SELECT chrom, CAST(seg_start AS BIGINT) AS "start",
         |  CAST(seg_end AS BIGINT) AS "end"
         |FROM seg WHERE seg_end IS NOT NULL AND depth = 0
         |ORDER BY 1, 2""".stripMargin,
    // q80: genome-sizes-aware complement — q78's depth-0 segments plus
    // the boundary gaps a genome file declares: [0, first) / [last,
    // size) per covered chromosome, whole [0, size) for a declared
    // chromosome with no data. Shares q74/q78's coverage CTEs; the
    // sizes table is the literal the engine passes.
    "q80_complement_sized" ->
      s"""$coverageSegCtes,
         |spans AS (SELECT chrom, min("start") AS f,
         |    max(greatest("end", "start")) AS l
         |  FROM iva GROUP BY 1),
         |sz(chrom, size) AS (SELECT * FROM (VALUES
         |  ('chr0', 11000000), ('chr1', 11000000), ('chr2', 11000000),
         |  ('chr3', 11000000), ('chrM', 16571)))
         |SELECT chrom, CAST(s AS BIGINT) AS "start",
         |  CAST(e AS BIGINT) AS "end"
         |FROM (
         |  SELECT chrom, seg_start AS s, seg_end AS e FROM seg
         |    WHERE seg_end IS NOT NULL AND depth = 0
         |  UNION ALL
         |  SELECT sz.chrom, 0, sp.f FROM sz JOIN spans sp USING (chrom)
         |    WHERE sp.f > 0
         |  UNION ALL
         |  SELECT sz.chrom, sp.l, sz.size
         |    FROM sz JOIN spans sp USING (chrom)
         |    WHERE sp.l < sz.size
         |  UNION ALL
         |  SELECT sz.chrom, 0, sz.size FROM sz
         |    WHERE sz.size > 0
         |      AND chrom NOT IN (SELECT chrom FROM spans)
         |) u ORDER BY chrom, "start"""".stripMargin,
    // q75: as-of attribution — DuckDB's NATIVE ASOF LEFT JOIN over the
    // same micro-truncated times, with right-side ties pre-deduped to
    // the max event_id (the pick AsofJoin.backward's window tiebreak
    // makes by construction)
    "q75_asof_join" -> q75Sql,
    // q81: q75 through AsofJoin.backwardRange (the RangeFill
    // skew-robust twin) — SAME oracle: the twin must be
    // result-indistinguishable from the windowed operator
    "q81_asof_range" -> q75Sql,
    // q76: forward as-of (next purchase at-or-after each click) —
    // DuckDB's native forward ASOF (c.tus <= p.tus picks the smallest
    // at-or-after time), ties pre-deduped to max event_id like q75
    "q76_asof_forward" -> q76Sql,
    // q82: q76 through AsofJoin.forwardRange — same pairing, forward
    "q82_asof_forward_range" -> q76Sql,
    // q77: bedtools-closest — naive all-pairs argmin over the same
    // (distance, b start, b id) tie rule the sweep composition
    // engineers (the oracle may be quadratic; the engine must not be).
    // LEFT JOIN, not inner: IntervalOps.closest keeps A rows on
    // chromosomes with no B candidates (null closest columns), and the
    // oracle must replay that left-outer path too — an inner join only
    // agreed by the accident of both generators emitting chr0..chr3
    "q77_closest" ->
      s"""WITH a AS (SELECT c_custkey AS aid,
         |    'chr' || (c_custkey % 4) AS chrom,
         |    (c_custkey*5557) % 10000000 AS astart,
         |    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300
         |      AS aend
         |  FROM customer),
         |bv AS ($ivB),
         |pair AS (SELECT a.aid, a.chrom, a.astart, a.aend,
         |    CASE WHEN b.iv_id IS NULL THEN NULL
         |      ELSE struct_pack(
         |        d := CASE WHEN a.astart < b."end"
         |                    AND b."start" < a.aend THEN 0
         |                  WHEN b."end" <= a.astart
         |                    THEN a.astart - b."end"
         |                  ELSE b."start" - a.aend END,
         |        s := b."start", i := b.iv_id, e := b."end") END AS c
         |  FROM a LEFT JOIN bv b ON a.chrom = b.chrom),
         |r AS (SELECT aid, chrom, astart, aend, min(c) AS m
         |  FROM pair GROUP BY 1, 2, 3, 4)
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
         |  CAST(m['s'] AS BIGINT) AS closest_start,
         |  CAST(m['e'] AS BIGINT) AS closest_end,
         |  CAST(m['d'] AS BIGINT) AS distance
         |FROM r ORDER BY aid""".stripMargin,
    // q83: bedtools-map — per-A aggregation of overlapping B values,
    // the plain LEFT JOIN + GROUP BY formulation (zero-overlap A rows
    // keep n=0 / null aggregates; v is never null so count(v) counts
    // matches exactly)
    "q83_interval_map" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |b2 AS (SELECT chrom, "start", "end", iv_id % 97 AS v FROM bv)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  count(b2.v) AS n_overlaps,
         |  CAST(sum(b2.v) AS BIGINT) AS v_sum,
         |  min(b2.v) AS v_min, max(b2.v) AS v_max,
         |  round(avg(b2.v), 4) AS v_mean_r
         |FROM a LEFT JOIN b2
         |  ON a.chrom = b2.chrom AND a.astart < b2."end"
         |    AND b2."start" < a.aend
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // q84: bedtools-jaccard — both sides merged with the textbook
    // gaps-and-islands windows (the formulation the skew-robust range
    // merge replaces), then intersection as the sum of clipped overlap
    // lengths between the two DISJOINT merged sets
    "q84_interval_jaccard" ->
      s"""WITH iva AS ($ivA),
         |ivb AS ($ivB),
         |${mergeCtes("iva", "a")},
         |${mergeCtes("ivb", "b")},
         |ix AS (SELECT
         |    CAST(coalesce(sum(least(a.me, b.me)
         |      - greatest(a.ms, b.ms)), 0) AS BIGINT) AS inter,
         |    count(*) AS n_intersections
         |  FROM am a JOIN bm b
         |    ON a.chrom = b.chrom AND a.ms < b.me AND b.ms < a.me),
         |la AS (SELECT CAST(coalesce(sum(me - ms), 0) AS BIGINT) AS l
         |  FROM am),
         |lb AS (SELECT CAST(coalesce(sum(me - ms), 0) AS BIGINT) AS l
         |  FROM bm)
         |SELECT ix.inter AS intersection,
         |  CAST(la.l + lb.l - ix.inter AS BIGINT) AS union_len,
         |  round(ix.inter * 1.0
         |    / nullif(la.l + lb.l - ix.inter, 0), 6) AS jaccard_r,
         |  ix.n_intersections
         |FROM ix, la, lb ORDER BY intersection""".stripMargin,
    // q85: bedtools-slop — pure greatest/least clamp arithmetic over
    // the declared 10-Mbp sizes (one Mbp below the generator ceiling
    // so BOTH clamps bind in the data)
    "q85_interval_slop" ->
      s"""WITH a AS ($ivC)
         |SELECT aid, chrom,
         |  CAST(greatest(astart - 250000, 0) AS BIGINT) AS "start",
         |  CAST(least(aend + 250000, 10000000) AS BIGINT) AS "end"
         |FROM a ORDER BY aid""".stripMargin,
    // q86: bedtools-flank — the two flank pieces as a UNION ALL, empty
    // pieces (floored at 0 / capped at the size) filtered exactly as
    // the engine's array-filter does
    "q86_interval_flank" ->
      s"""WITH a AS ($ivC)
         |SELECT aid, 'left' AS side, chrom,
         |  CAST(greatest(astart - 100, 0) AS BIGINT) AS "start",
         |  CAST(astart AS BIGINT) AS "end"
         |FROM a WHERE greatest(astart - 100, 0) < astart
         |UNION ALL
         |SELECT aid, 'right' AS side, chrom,
         |  CAST(aend AS BIGINT) AS "start",
         |  CAST(least(aend + 200, 10000000) AS BIGINT) AS "end"
         |FROM a WHERE aend < least(aend + 200, 10000000)
         |ORDER BY aid, side""".stripMargin,
    // q87: bedtools-window — the naive range-predicate proximity join
    // (the engine's binned equi-join on slop-extended coordinates must
    // reproduce it pair for pair), rolled up per A with placement
    // witnesses
    "q87_interval_window" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB)
         |SELECT a.aid, count(*) AS n_near,
         |  CAST(sum(b."start") AS BIGINT) AS sum_bstart,
         |  min(b.iv_id) AS min_bid, max(b.iv_id) AS max_bid
         |FROM a JOIN bv b
         |  ON a.chrom = b.chrom AND a.astart - 20000 < b."end"
         |    AND b."start" < a.aend + 20000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q88: bedtools-coverage — count from the raw overlap join; union
    // covered bases from per-aid islands over the DISTINCT clipped
    // segments (the q84 dedup rule: ivB is duplicate-heavy, and the
    // ROWS-framed island windows are tie-unsafe on duplicates)
    "q88_interval_coverage_by" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |cnt AS (SELECT a.aid, count(*) AS n
         |  FROM a JOIN bv b ON a.chrom = b.chrom
         |    AND a.astart < b."end" AND b."start" < a.aend
         |  GROUP BY 1),
         |seg AS (SELECT DISTINCT a.aid,
         |    greatest(a.astart, b."start") AS cs,
         |    least(a.aend, b."end") AS ce
         |  FROM a JOIN bv b ON a.chrom = b.chrom
         |    AND a.astart < b."end" AND b."start" < a.aend),
         |sg AS (SELECT aid, cs, ce,
         |    CASE WHEN max(ce) OVER w IS NULL OR cs > max(ce) OVER w
         |         THEN 1 ELSE 0 END AS new_grp
         |  FROM seg
         |  WINDOW w AS (PARTITION BY aid ORDER BY cs, ce
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |sh AS (SELECT aid, cs, ce,
         |    sum(new_grp) OVER (PARTITION BY aid ORDER BY cs, ce
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM sg),
         |cov AS (SELECT aid, CAST(sum(me - ms) AS BIGINT) AS c
         |  FROM (SELECT aid, min(cs) AS ms, max(ce) AS me
         |        FROM sh GROUP BY aid, grp) u
         |  GROUP BY 1)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  coalesce(cnt.n, 0) AS n_overlaps,
         |  CAST(coalesce(cov.c, 0) AS BIGINT) AS covered_bases,
         |  CAST(a.aend - a.astart AS BIGINT) AS a_len,
         |  round(coalesce(cov.c, 0) * 1.0 / (a.aend - a.astart), 6)
         |    AS fraction_r
         |FROM a LEFT JOIN cnt ON a.aid = cnt.aid
         |  LEFT JOIN cov ON a.aid = cov.aid
         |ORDER BY a.aid""".stripMargin,
    // q89: bedtools-cluster — tie-safe DISTINCT islands, then each
    // row's run by containment of its start (merged runs never touch, so the
    // join is exactly one run per row); cluster_n recounts assigned
    // source rows per run
    "q89_interval_cluster" ->
      s"""WITH ivb AS ($ivB),
         |${mergeCtes("ivb", "c")},
         |j AS (SELECT b.iv_id, b.chrom, b."start", b."end",
         |    m.ms, m.me
         |  FROM ivb b JOIN cm m ON b.chrom = m.chrom
         |    AND m.ms <= b."start" AND b."start" <= m.me)
         |SELECT iv_id, chrom, CAST("start" AS BIGINT) AS "start",
         |  CAST("end" AS BIGINT) AS "end",
         |  CAST(ms AS BIGINT) AS cluster_start,
         |  CAST(me AS BIGINT) AS cluster_end,
         |  count(*) OVER (PARTITION BY chrom, ms) AS cluster_n
         |FROM j ORDER BY iv_id""".stripMargin,
    // q90: bedtools-makewindows — generate_series over the same
    // literal genome declaration the engine tiles
    "q90_make_windows" ->
      """WITH sz(chrom, size) AS (SELECT * FROM (VALUES
        |  ('chr0', 11000000), ('chr1', 11000000), ('chr2', 11000000),
        |  ('chr3', 11000000), ('chrM', 16571))),
        |w AS (SELECT chrom, unnest(range(0, size, 500000)) AS ws, size
        |  FROM sz)
        |SELECT chrom, CAST(ws AS BIGINT) AS "start",
        |  CAST(least(ws + 750000, size) AS BIGINT) AS "end"
        |FROM w ORDER BY chrom, "start"""".stripMargin,
    // q91: bedtools-shift — the same clamp arithmetic in SQL, both
    // directions (top-cap collapses whole intervals to boundary
    // points; floor at 0 on the left shift)
    "q91_interval_shift" ->
      s"""WITH a AS ($ivC)
         |SELECT aid, 'right' AS dir, chrom,
         |  CAST(least(astart + 300000, 10000000) AS BIGINT) AS "start",
         |  CAST(least(aend + 300000, 10000000) AS BIGINT) AS "end"
         |FROM a
         |UNION ALL
         |SELECT aid, 'left' AS dir, chrom,
         |  CAST(greatest(astart - 300000, 0) AS BIGINT) AS "start",
         |  CAST(greatest(aend - 300000, 0) AS BIGINT) AS "end"
         |FROM a
         |ORDER BY aid, dir""".stripMargin,
    // q92: bedtools-multiinter — the per-set depth grid: union
    // breakpoints x sets (zero-filled), textbook per-(chrom, set)
    // cumulative windows, membership per segment, rolled up per
    // (chrom, membership)
    "q92_multiinter" ->
      s"""WITH iva AS ($ivA),
         |ivb AS ($ivB),
         |a3 AS ($ivC),
         |u AS (SELECT 'li' AS s, chrom, "start", "end" FROM iva
         |  UNION ALL SELECT 'ord', chrom, "start", "end" FROM ivb
         |  UNION ALL SELECT 'cust', chrom, astart, aend FROM a3),
         |ev AS (SELECT s, chrom, "start" AS pos, 1 AS d FROM u
         |  UNION ALL
         |  SELECT s, chrom, greatest("end", "start"), -1 FROM u),
         |net AS (SELECT chrom, pos, s, CAST(sum(d) AS BIGINT) AS d
         |  FROM ev GROUP BY 1, 2, 3 HAVING sum(d) <> 0),
         |grid AS (SELECT DISTINCT chrom, pos FROM net),
         |setsl AS (SELECT DISTINCT s FROM net),
         |filled AS (SELECT g.chrom, g.pos, sl.s, coalesce(n.d, 0) AS d
         |  FROM grid g CROSS JOIN setsl sl
         |  LEFT JOIN net n ON n.chrom = g.chrom AND n.pos = g.pos
         |    AND n.s = sl.s),
         |dep AS (SELECT chrom, pos, s,
         |    sum(d) OVER (PARTITION BY chrom, s ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS depth
         |  FROM filled),
         |mem AS (SELECT chrom, pos,
         |    count(*) FILTER (WHERE depth > 0) AS nsets,
         |    string_agg(s, ',' ORDER BY s) FILTER (WHERE depth > 0)
         |      AS sets
         |  FROM dep GROUP BY 1, 2),
         |seg AS (SELECT chrom, pos AS seg_start,
         |    lead(pos) OVER (PARTITION BY chrom ORDER BY pos)
         |      AS seg_end,
         |    nsets, sets
         |  FROM mem)
         |SELECT chrom, sets, count(*) AS n_segs,
         |  CAST(sum(seg_end - seg_start) AS BIGINT) AS bases,
         |  CAST(sum(seg_start) AS BIGINT) AS sum_start,
         |  CAST(max(nsets) AS BIGINT) AS n_sets
         |FROM seg WHERE seg_end IS NOT NULL AND nsets > 0
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q93: bedtools-reldist — union-timeline windows, one per
    // direction, each ordering ties so a COINCIDING B midpoint is an
    // inclusive flanker (B before A ascending for prev; A before B
    // ascending for next, so the following-frame picks it up)
    "q93_reldist" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |am AS (SELECT aid, chrom, (astart + aend) // 2 AS pos FROM a),
         |bm AS (SELECT chrom, ("start" + "end") // 2 AS pos FROM bv),
         |tl AS (SELECT chrom, pos, 1 AS isa,
         |    CAST(NULL AS BIGINT) AS bpos, aid FROM am
         |  UNION ALL
         |  SELECT chrom, pos, 0, pos, NULL FROM bm),
         |fl AS (SELECT chrom, pos, isa, aid,
         |    max(bpos) OVER wprev AS prev,
         |    min(bpos) OVER wnext AS next
         |  FROM tl
         |  WINDOW wprev AS (PARTITION BY chrom ORDER BY pos, isa
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wnext AS (PARTITION BY chrom ORDER BY pos, isa DESC
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |d AS (SELECT aid, pos, prev, next,
         |    CASE WHEN prev IS NULL OR next IS NULL THEN NULL
         |         WHEN next = prev THEN 0.0
         |         ELSE least(pos - prev, next - pos) * 1.0
         |           / (next - prev) END AS rd
         |  FROM fl WHERE isa = 1)
         |SELECT CAST(floor(rd * 100) AS BIGINT) AS bin,
         |  count(*) AS n_a,
         |  CAST(sum(next - prev) AS BIGINT) AS sum_span,
         |  CAST(sum(pos) AS BIGINT) AS sum_amid
         |FROM d WHERE rd IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q94: bedtools-shuffle (seeded deterministic) — the q55 xxhash64
    // HUGEINT replay chain computes each row's placement draw, then
    // the same pmod/clamp arithmetic
    "q94_interval_shuffle" -> q94Sql,
    // q95: bedtools-annotate — the q88 tie-safe island formulation
    // replayed once per labeled set, unioned in long format
    "q95_interval_annotate" -> q95Sql,
    // q96: bedtools closest -s — q77's all-pairs argmin with the
    // strand equality added to the candidate join ('.' matches '.')
    "q96_closest_stranded" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivBS),
         |pair AS (SELECT a.aid, a.chrom, a.astart, a.aend,
         |    CASE WHEN b.iv_id IS NULL THEN NULL
         |      ELSE struct_pack(
         |        d := CASE WHEN a.astart < b."end"
         |                    AND b."start" < a.aend THEN 0
         |                  WHEN b."end" <= a.astart
         |                    THEN a.astart - b."end"
         |                  ELSE b."start" - a.aend END,
         |        s := b."start", i := b.iv_id, e := b."end") END AS c
         |  FROM a LEFT JOIN bv b
         |    ON a.chrom = b.chrom AND a.strand = b.strand),
         |r AS (SELECT aid, chrom, astart, aend, min(c) AS m
         |  FROM pair GROUP BY 1, 2, 3, 4)
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
         |  CAST(m['s'] AS BIGINT) AS closest_start,
         |  CAST(m['e'] AS BIGINT) AS closest_end,
         |  CAST(m['d'] AS BIGINT) AS distance
         |FROM r ORDER BY aid""".stripMargin,
    // q97: bedtools map -S — q83's LEFT JOIN restricted to the
    // opposite '+'/'-' pairing ('.' rows never match; their A rows
    // keep zero overlaps)
    "q97_map_stranded" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivBS),
         |b2 AS (SELECT chrom, "start", "end", strand,
         |  iv_id % 97 AS v FROM bv)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  count(b2.v) AS n_overlaps,
         |  CAST(sum(b2.v) AS BIGINT) AS v_sum,
         |  min(b2.v) AS v_min, max(b2.v) AS v_max,
         |  round(avg(b2.v), 4) AS v_mean_r
         |FROM a LEFT JOIN b2
         |  ON a.chrom = b2.chrom AND a.astart < b2."end"
         |    AND b2."start" < a.aend
         |    AND ((a.strand = '+' AND b2.strand = '-')
         |      OR (a.strand = '-' AND b2.strand = '+'))
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // q98: bedtools subtract -s — q79's per-base explode with the
    // strand equality in the coverage test (only same-strand B bases
    // remove)
    "q98_subtract_stranded" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivBS),
         |pos AS (SELECT aid, chrom, strand,
         |    unnest(range(astart, aend)) AS p
         |  FROM a),
         |alive AS (SELECT aid, chrom, p FROM pos
         |  WHERE NOT EXISTS (SELECT 1 FROM bv b
         |    WHERE b.chrom = pos.chrom AND b.strand = pos.strand
         |      AND b."start" <= pos.p AND pos.p < b."end")),
         |isl AS (SELECT aid, chrom, p,
         |    p - row_number() OVER (PARTITION BY aid ORDER BY p)
         |      AS grp
         |  FROM alive)
         |SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
         |  CAST(max(p) + 1 AS BIGINT) AS "end"
         |FROM isl GROUP BY aid, chrom, grp
         |ORDER BY aid, "start"""".stripMargin,
    // q107: bedtools subtract -S — q98's per-base
    // explode-and-recoalesce with the OPPOSITE pairing in the
    // coverage test. The gate's point: a '.'-strand A row (a third of
    // the probes) matches nothing and must come back UNMODIFIED —
    // this formulation returns it whole by construction, so an engine
    // that drops unmatchable A rows fails on row count.
    "q107_subtract_opposite" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivBS),
         |pos AS (SELECT aid, chrom, strand,
         |    unnest(range(astart, aend)) AS p
         |  FROM a),
         |alive AS (SELECT aid, chrom, p FROM pos
         |  WHERE NOT EXISTS (SELECT 1 FROM bv b
         |    WHERE b.chrom = pos.chrom
         |      AND ((pos.strand = '+' AND b.strand = '-') OR
         |           (pos.strand = '-' AND b.strand = '+'))
         |      AND b."start" <= pos.p AND pos.p < b."end")),
         |isl AS (SELECT aid, chrom, p,
         |    p - row_number() OVER (PARTITION BY aid ORDER BY p)
         |      AS grp
         |  FROM alive)
         |SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
         |  CAST(max(p) + 1 AS BIGINT) AS "end"
         |FROM isl GROUP BY aid, chrom, grp
         |ORDER BY aid, "start"""".stripMargin,
    // q108: bedtools intersect -wo — the plain pairwise join with the
    // clipped-overlap arithmetic inline; the engine's binned
    // equi-join must reproduce every pair exactly once.
    // NOTE (q108/q109): the engine excludes ZERO-LENGTH A rows from
    // the pair branch (they cover no bases; only wao/loj miss rows
    // report them), while this naive strict-overlap formulation
    // would emit a 0-bp pair for a point strictly inside B. The two
    // agree ONLY because ivC's intervals have minimum length 30 —
    // the fixtures carry no zero-length A rows by construction; the
    // engine-side choice is pinned by the intersectJoin unit spec.
    "q108_intersect_wo" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end", b.iv_id AS b_id,
         |  CAST(b."start" AS BIGINT) AS b_start,
         |  CAST(b."end" AS BIGINT) AS b_end,
         |  CAST(least(a.aend, b."end") - greatest(a.astart, b."start")
         |    AS BIGINT) AS overlap_bp
         |FROM a JOIN bv b ON a.chrom = b.chrom
         |  AND a.astart < b."end" AND b."start" < a.aend
         |ORDER BY a.aid, b_id""".stripMargin,
    // q109: bedtools intersect -wao -f 0.5 — pairs covering >= half
    // the A interval (0.5 * integer length is exact in doubles, the
    // q100 rule), plus a zero row for every A with NO qualifying
    // pair: the retention -wao guarantees even when a threshold
    // filtered every overlap
    "q109_intersect_wao" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |p AS (SELECT a.aid, a.chrom, a.astart, a.aend,
         |    b.iv_id AS b_id, b."start" AS bs, b."end" AS be,
         |    least(a.aend, b."end") - greatest(a.astart, b."start")
         |      AS ovl
         |  FROM a JOIN bv b ON a.chrom = b.chrom
         |    AND a.astart < b."end" AND b."start" < a.aend
         |  WHERE (least(a.aend, b."end") - greatest(a.astart, b."start"))
         |    >= 0.5 * (a.aend - a.astart))
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", b_id,
         |  CAST(bs AS BIGINT) AS b_start, CAST(be AS BIGINT) AS b_end,
         |  CAST(ovl AS BIGINT) AS overlap_bp
         |FROM p
         |UNION ALL
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT),
         |  CAST(a.aend AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(0 AS BIGINT)
         |FROM a WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.aid = a.aid)
         |ORDER BY aid, b_id NULLS FIRST""".stripMargin,
    // q99: bedtools window -w 20000 -s — q87's proximity pairing with
    // the strand equality in the join
    "q99_window_stranded" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivBS)
         |SELECT a.aid, count(*) AS n_near,
         |  CAST(sum(b."start") AS BIGINT) AS sum_bstart,
         |  min(b.iv_id) AS min_bid, max(b.iv_id) AS max_bid
         |FROM a JOIN bv b
         |  ON a.chrom = b.chrom AND a.strand = b.strand
         |    AND a.astart - 20000 < b."end"
         |    AND b."start" < a.aend + 20000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q100: bedtools map -f 0.5 -F 0.25 — q83's LEFT JOIN with both
    // fraction inequalities on the exact clipped overlap (integer *
    // 0.5/0.25 is exact in doubles, so >= agrees bit-for-bit)
    "q100_map_fraction" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |b2 AS (SELECT chrom, "start", "end", iv_id % 97 AS v FROM bv)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  count(b2.v) AS n_overlaps,
         |  CAST(sum(b2.v) AS BIGINT) AS v_sum,
         |  min(b2.v) AS v_min, max(b2.v) AS v_max,
         |  round(avg(b2.v), 4) AS v_mean_r
         |FROM a LEFT JOIN b2
         |  ON a.chrom = b2.chrom AND a.astart < b2."end"
         |    AND b2."start" < a.aend
         |    AND least(a.aend, b2."end") - greatest(a.astart, b2."start")
         |      >= 0.5 * (a.aend - a.astart)
         |    AND least(a.aend, b2."end") - greatest(a.astart, b2."start")
         |      >= 0.25 * (b2."end" - b2."start")
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // q101: bedtools closest -t all -D ref — every pair at each A's
    // all-pairs minimum distance, signed negative for upstream B
    "q101_closest_all" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |pair AS (SELECT a.aid, b.iv_id AS bid,
         |    b."start" AS bs, b."end" AS be,
         |    CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
         |         WHEN b."end" <= a.astart THEN a.astart - b."end"
         |         ELSE b."start" - a.aend END AS d
         |  FROM a JOIN bv b ON a.chrom = b.chrom),
         |mn AS (SELECT aid, min(d) AS md FROM pair GROUP BY 1),
         |ties AS (SELECT p.* FROM pair p
         |  JOIN mn ON p.aid = mn.aid AND p.d = mn.md)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  t.bid AS closest_id,
         |  CAST(t.bs AS BIGINT) AS closest_start,
         |  CAST(t.be AS BIGINT) AS closest_end,
         |  CAST(t.d AS BIGINT) AS distance,
         |  CAST(CASE WHEN t.d = 0 THEN 0
         |    WHEN t.be <= a.astart THEN -t.d ELSE t.d END
         |    AS BIGINT) AS signed_distance
         |FROM a LEFT JOIN ties t ON a.aid = t.aid
         |ORDER BY a.aid, closest_id""".stripMargin,
    // q102: bedtools getfasta — the ENGINE reads bytes from the
    // synthetic reference file via .fai byte math; the oracle rebuilds
    // every sequence character by character from the generating
    // formula base(p, k) = 'ACGT'[(p*7 + k*11) % 4] without ever
    // seeing the file, so any byte-offset or line-wrap error fails
    "q102_getfasta" ->
      """WITH a AS (SELECT c_custkey AS aid,
        |    'chr' || (c_custkey % 4) AS chrom,
        |    c_custkey % 4 AS k,
        |    (c_custkey*37) % 49000 AS s,
        |    (c_custkey*37) % 49000 + 10 + c_custkey % 90 AS e
        |  FROM customer),
        |pos AS (SELECT aid, k, unnest(range(s, e)) AS i FROM a),
        |seqs AS (SELECT aid,
        |    string_agg(substr('ACGT',
        |      CAST((i*7 + k*11) % 4 AS INT) + 1, 1),
        |      '' ORDER BY i) AS sequence
        |  FROM pos GROUP BY aid)
        |SELECT a.aid, a.chrom, CAST(a.s AS BIGINT) AS "start",
        |  CAST(a.e AS BIGINT) AS "end", seqs.sequence
        |FROM a JOIN seqs USING (aid) ORDER BY a.aid""".stripMargin,
    // q103: bedtools nuc — counts per residue class of the same
    // formula; fractions are single double divisions of exact
    // integers, rounded identically on both engines
    "q103_nuc" ->
      """WITH a AS (SELECT c_custkey AS aid,
        |    'chr' || (c_custkey % 4) AS chrom,
        |    c_custkey % 4 AS k,
        |    (c_custkey*37) % 49000 AS s,
        |    (c_custkey*37) % 49000 + 10 + c_custkey % 90 AS e
        |  FROM customer),
        |pos AS (SELECT aid, k, unnest(range(s, e)) AS i FROM a),
        |cnts AS (SELECT aid, count(*) AS seq_len,
        |    sum(CASE WHEN (i*7 + k*11) % 4 = 0 THEN 1 ELSE 0 END)
        |      AS n_a,
        |    sum(CASE WHEN (i*7 + k*11) % 4 = 1 THEN 1 ELSE 0 END)
        |      AS n_c,
        |    sum(CASE WHEN (i*7 + k*11) % 4 = 2 THEN 1 ELSE 0 END)
        |      AS n_g,
        |    sum(CASE WHEN (i*7 + k*11) % 4 = 3 THEN 1 ELSE 0 END)
        |      AS n_t
        |  FROM pos GROUP BY aid)
        |SELECT a.aid, a.chrom, CAST(a.s AS BIGINT) AS "start",
        |  CAST(a.e AS BIGINT) AS "end",
        |  CAST(seq_len AS BIGINT) AS seq_len,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_c AS BIGINT) AS n_c,
        |  CAST(n_g AS BIGINT) AS n_g, CAST(n_t AS BIGINT) AS n_t,
        |  CAST(0 AS BIGINT) AS n_n, CAST(0 AS BIGINT) AS n_other,
        |  round((n_a + n_t) / CAST(seq_len AS DOUBLE), 6) AS pct_at_r,
        |  round((n_c + n_g) / CAST(seq_len AS DOUBLE), 6) AS pct_gc_r
        |FROM a JOIN cnts USING (aid) ORDER BY a.aid""".stripMargin,
    // q106: bedtools getfasta -s -name — the ENGINE fetches bytes
    // then applies a codegen'd translate+reverse; the oracle replays
    // the generating formula WITH the complement arithmetic inline:
    // '-' rows aggregate 'TGCA'[(i*7+k*11)%4] in DESCENDING position
    // order (reverse complement of the forward formula), '+'/'.' rows
    // the forward 'ACGT' form — so a wrong alphabet, missed reverse,
    // or strand-policy slip fails the hash. Header replay pins the
    // name::chrom:start-end(strand) format.
    "q106_getfasta_stranded" ->
      """WITH a AS (SELECT c_custkey AS aid,
        |    'chr' || (c_custkey % 4) AS chrom,
        |    c_custkey % 4 AS k,
        |    (c_custkey*37) % 49000 AS s,
        |    (c_custkey*37) % 49000 + 10 + c_custkey % 90 AS e,
        |    CASE c_custkey % 3 WHEN 0 THEN '+' WHEN 1 THEN '-'
        |      ELSE '.' END AS strand
        |  FROM customer),
        |pos AS (SELECT aid, k, strand, unnest(range(s, e)) AS i
        |  FROM a),
        |seqs AS (SELECT aid,
        |    string_agg(CASE WHEN strand = '-'
        |        THEN substr('TGCA',
        |          CAST((i*7 + k*11) % 4 AS INT) + 1, 1)
        |        ELSE substr('ACGT',
        |          CAST((i*7 + k*11) % 4 AS INT) + 1, 1) END,
        |      '' ORDER BY CASE WHEN strand = '-' THEN -i ELSE i END)
        |      AS sequence
        |  FROM pos GROUP BY aid)
        |SELECT a.aid, a.chrom, CAST(a.s AS BIGINT) AS "start",
        |  CAST(a.e AS BIGINT) AS "end", a.strand,
        |  'iv_' || a.aid AS name, seqs.sequence,
        |  'iv_' || a.aid || '::' || a.chrom || ':' || a.s || '-' ||
        |    a.e || '(' || a.strand || ')' AS fasta_header
        |FROM a JOIN seqs USING (aid) ORDER BY a.aid""".stripMargin,
    // q110: bedtools getfasta -split -s — the BED12 spliced rule:
    // the sequence is the blocks' concatenation, reverse complemented
    // WHOLE on '-' rows. The oracle replays the generating formula
    // per (block, position) and aggregates in descending (block,
    // position) order with the complement alphabet for '-' rows — so
    // a block-order slip, a per-block (instead of whole) revcomp, or
    // an offset error all fail the hash.
    "q110_getfasta_split" ->
      """WITH a AS (SELECT c_custkey AS aid,
        |    'chr' || (c_custkey % 4) AS chrom,
        |    c_custkey % 4 AS k,
        |    (c_custkey*37) % 49000 AS s,
        |    (c_custkey*37) % 49000 + 10 + c_custkey % 90 AS e,
        |    CASE c_custkey % 3 WHEN 0 THEN '+' WHEN 1 THEN '-'
        |      ELSE '.' END AS strand
        |  FROM customer),
        |pos AS (SELECT aid, k, strand, 1 AS blk,
        |    unnest(range(s, s + 5 + aid % 7)) AS i FROM a
        |  UNION ALL
        |  SELECT aid, k, strand, 2,
        |    unnest(range(s + 20 + aid % 13,
        |                 s + 20 + aid % 13 + 11)) FROM a),
        |seqs AS (SELECT aid,
        |    string_agg(CASE WHEN strand = '-'
        |        THEN substr('TGCA',
        |          CAST((i*7 + k*11) % 4 AS INT) + 1, 1)
        |        ELSE substr('ACGT',
        |          CAST((i*7 + k*11) % 4 AS INT) + 1, 1) END,
        |      '' ORDER BY CASE WHEN strand = '-' THEN -blk ELSE blk END,
        |        CASE WHEN strand = '-' THEN -i ELSE i END)
        |      AS sequence
        |  FROM pos GROUP BY aid)
        |SELECT a.aid, a.chrom, CAST(a.s AS BIGINT) AS "start",
        |  CAST(a.e AS BIGINT) AS "end", a.strand, seqs.sequence
        |FROM a JOIN seqs USING (aid) ORDER BY a.aid""".stripMargin,
    // q114: bedtools intersect -split -f 0.5 -wao — the same
    // closed-form blocks (1 + aid%3 blocks of size len // 5 at
    // stride 2·size) exploded with unnest(range(nb)), joined
    // per-block, re-aggregated per (A, B) pair, with the fraction
    // against BLOCK bases; misses keep a zero row
    "q114_intersect_split" ->
      s"""WITH a AS ($ivC),
         |ab AS (SELECT aid, chrom, astart, aend,
         |    (aend - astart) // 5 AS bsz, aid % 3 + 1 AS nb FROM a),
         |blk AS (SELECT aid, chrom, astart, aend, nb * bsz AS blen,
         |    astart + x * 2 * bsz AS ks,
         |    astart + x * 2 * bsz + bsz AS ke
         |  FROM (SELECT ab.*, unnest(range(nb)) AS x FROM ab)),
         |bv AS ($ivB),
         |pr AS (SELECT k.aid, k.chrom, k.astart, k.aend, k.blen,
         |    v.iv_id AS bid, v."start" AS bs, v."end" AS be,
         |    least(k.ke, v."end") - greatest(k.ks, v."start") AS ov
         |  FROM blk k JOIN bv v ON k.chrom = v.chrom
         |    AND k.ks < v."end" AND v."start" < k.ke),
         |pairs AS (SELECT aid, chrom, astart, aend, blen, bid, bs, be,
         |    sum(ov) AS ovl
         |  FROM pr GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
         |qual AS (SELECT * FROM pairs WHERE ovl >= 0.5 * blen)
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", bid AS b_id,
         |  CAST(bs AS BIGINT) AS b_start,
         |  CAST(be AS BIGINT) AS b_end,
         |  CAST(ovl AS BIGINT) AS overlap_bp
         |FROM qual
         |UNION ALL
         |SELECT aid, chrom, CAST(astart AS BIGINT),
         |  CAST(aend AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(0 AS BIGINT)
         |FROM a WHERE aid NOT IN (SELECT aid FROM qual)
         |ORDER BY aid, b_id NULLS FIRST""".stripMargin,
    // q115: sliding-window chunking — the same 64-word windows every
    // 48 words via DuckDB's stride generate_series and 1-based
    // inclusive list slicing (which clamps at the end exactly like
    // Spark's slice); both engines split on single spaces, so empty
    // tokens agree too
    "q115_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (SELECT doc_id, w,
        |    unnest(generate_series(0, len(w) - 1, 48)) AS off
        |  FROM t)
        |SELECT doc_id, CAST(off // 48 AS BIGINT) AS chunk_index,
        |  array_to_string(w[off+1:off+64], ' ') AS chunk_text,
        |  CAST(len(w[off+1:off+64]) AS BIGINT) AS chunk_words
        |FROM o ORDER BY doc_id, chunk_index""".stripMargin,
    // q111: bedtools closest -k 3 — the all-pairs row_number ranking
    // under the q77 argmin rule (distance, b start, b id); LEFT JOIN
    // keeps no-candidate A rows as one null row with null rank
    "q111_closest_k" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivB),
         |pair AS (SELECT a.aid, b.iv_id AS bid,
         |    b."start" AS bs, b."end" AS be,
         |    CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
         |         WHEN b."end" <= a.astart THEN a.astart - b."end"
         |         ELSE b."start" - a.aend END AS d
         |  FROM a JOIN bv b ON a.chrom = b.chrom),
         |rk AS (SELECT *, row_number() OVER
         |    (PARTITION BY aid ORDER BY d, bs, bid) AS rnk
         |  FROM pair)
         |SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  r.bid AS closest_id,
         |  CAST(r.bs AS BIGINT) AS closest_start,
         |  CAST(r.be AS BIGINT) AS closest_end,
         |  CAST(r.d AS BIGINT) AS distance,
         |  CAST(CASE WHEN r.d = 0 THEN 0
         |    WHEN r.be <= a.astart THEN -r.d ELSE r.d END
         |    AS BIGINT) AS signed_distance,
         |  CAST(r.rnk AS BIGINT) AS "rank"
         |FROM a LEFT JOIN rk r ON a.aid = r.aid AND r.rnk <= 3
         |ORDER BY a.aid, "rank"""".stripMargin,
    // q112: bedtools closest -io -D a — q77's argmin with strictly
    // overlapping pairs excluded in the LEFT JOIN's ON clause
    // (book-ended distance-0 pairs stay) and the winner's sign
    // flipped for '-'-strand A rows
    "q112_closest_io" ->
      s"""WITH a AS ($ivCS),
         |bv AS ($ivB),
         |pair AS (SELECT a.aid, a.chrom, a.astart, a.aend, a.strand,
         |    CASE WHEN b.iv_id IS NULL THEN NULL
         |      ELSE struct_pack(
         |        d := CASE WHEN b."end" <= a.astart
         |                    THEN a.astart - b."end"
         |                  ELSE b."start" - a.aend END,
         |        s := b."start", i := b.iv_id, e := b."end") END AS c
         |  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
         |    AND NOT (a.astart < b."end" AND b."start" < a.aend)),
         |r AS (SELECT aid, chrom, astart, aend, strand, min(c) AS m
         |  FROM pair GROUP BY 1, 2, 3, 4, 5)
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
         |  CAST(m['s'] AS BIGINT) AS closest_start,
         |  CAST(m['e'] AS BIGINT) AS closest_end,
         |  CAST(m['d'] AS BIGINT) AS distance,
         |  CAST((CASE WHEN m['d'] = 0 THEN 0
         |      WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END)
         |    * (CASE WHEN strand = '-' THEN -1 ELSE 1 END)
         |    AS BIGINT) AS signed_distance
         |FROM r ORDER BY aid""".stripMargin,
    // q113: bedtools closest -iu (-D ref) and -id (-D b), unioned
    // with a mode tag. The iu-ref exclusion algebraically reduces to
    // "B must end at-or-after A's start" (an upstream candidate has
    // d > 0 AND b.end <= a.start, i.e. b.end < a.start); the idb
    // exclusion is the strand-conditional mirror under the B-strand
    // flip. The idb winner's sign flips by ITS OWN strand (carried as
    // a trailing struct field past the unique id, so the argmin is
    // unaffected).
    "q113_closest_updown" ->
      s"""WITH a AS ($ivC),
         |bv AS ($ivBS),
         |pu AS (SELECT a.aid, a.chrom, a.astart, a.aend,
         |    CASE WHEN b.iv_id IS NULL THEN NULL
         |      ELSE struct_pack(
         |        d := CASE WHEN a.astart < b."end"
         |                    AND b."start" < a.aend THEN 0
         |                  WHEN b."end" <= a.astart
         |                    THEN a.astart - b."end"
         |                  ELSE b."start" - a.aend END,
         |        s := b."start", i := b.iv_id, e := b."end") END AS c
         |  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
         |    AND b."end" >= a.astart),
         |ru AS (SELECT aid, chrom, astart, aend, min(c) AS m
         |  FROM pu GROUP BY 1, 2, 3, 4),
         |pd AS (SELECT a.aid, a.chrom, a.astart, a.aend,
         |    CASE WHEN b.iv_id IS NULL THEN NULL
         |      ELSE struct_pack(
         |        d := CASE WHEN a.astart < b."end"
         |                    AND b."start" < a.aend THEN 0
         |                  WHEN b."end" <= a.astart
         |                    THEN a.astart - b."end"
         |                  ELSE b."start" - a.aend END,
         |        s := b."start", i := b.iv_id, e := b."end",
         |        t := b.strand) END AS c
         |  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
         |    AND NOT ((b.strand <> '-' AND b."start" > a.aend)
         |      OR (b.strand = '-' AND b."end" < a.astart))),
         |rd AS (SELECT aid, chrom, astart, aend, min(c) AS m
         |  FROM pd GROUP BY 1, 2, 3, 4)
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
         |  CAST(m['s'] AS BIGINT) AS closest_start,
         |  CAST(m['e'] AS BIGINT) AS closest_end,
         |  CAST(m['d'] AS BIGINT) AS distance,
         |  CAST(CASE WHEN m['d'] = 0 THEN 0
         |    WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END
         |    AS BIGINT) AS signed_distance,
         |  'iu' AS mode
         |FROM ru
         |UNION ALL
         |SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
         |  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
         |  CAST(m['s'] AS BIGINT) AS closest_start,
         |  CAST(m['e'] AS BIGINT) AS closest_end,
         |  CAST(m['d'] AS BIGINT) AS distance,
         |  CAST((CASE WHEN m['d'] = 0 THEN 0
         |      WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END)
         |    * (CASE WHEN m['t'] = '-' THEN -1 ELSE 1 END)
         |    AS BIGINT) AS signed_distance,
         |  'idb' AS mode
         |FROM rd ORDER BY mode, aid""".stripMargin,
    // q71: kNN majority-label audit over the IVF search path
    "q71_knn_label_audit" -> q71Sql,

    // q56: the REAL pixel decoder (ImageIO) against closed-form
    // two-tone PNGs: brightness = (a+b)/510 and the left/right 4x2
    // thumbnail cells = tone/255*2-1, all single correctly-rounded
    // divisions of the same exact rationals the decoder computes from
    // its integer pixel sums — bit-identical doubles on both engines
    "q56_media_pixels" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  doc_id % 256 AS a, (doc_id * 31) % 256 AS b FROM documents)
        |SELECT doc_id,
        | CAST(4 * (doc_id % 4 + 1) AS BIGINT) AS width,
        | CAST(doc_id % 6 + 1 AS BIGINT) AS height,
        | round((a + b) / 510.0, 6) AS brightness,
        | round(a / 255.0 * 2 - 1, 3) AS emb_left,
        | round(b / 255.0 * 2 - 1, 3) AS emb_right
        |FROM d ORDER BY doc_id""".stripMargin,

    // q57: the REAL PCM sample decoder against the same id-derived
    // sample formula aggregated in SQL; squares are exact dyadic
    // rationals (power-of-two normalizers), so sum/avg/sqrt round
    // identically in both engines. x*x, not pow(x,2) — pow may detour
    // through exp/log and lose the exactness argument
    "q57_wav_pcm" ->
      """WITH s AS (SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 2 = 0
        |    THEN ((d.doc_id * 7 + t.i * 13) % 256 - 128) / 128.0
        |    ELSE (((d.doc_id * 7 + t.i * 13) * 257) % 65536 - 32768)
        |      / 32768.0 END AS x
        |  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
        |  CROSS JOIN generate_series(0, 63) t(i)
        |  WHERE t.i <= d.doc_id % 64)
        |SELECT doc_id, round(sqrt(avg(x * x)), 6) AS rms,
        |  round(max(abs(x)), 6) AS peak
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q64: the stereo convention gate — 2-channel interleaved PCM where
    // the flat formula differs at every consecutive index, so the
    // interleaved-flat rms/peak convention (and nothing else) matches;
    // channels/n_frames are PARSED from the RIFF header (stereo
    // blockAlign), the oracle computes them closed-form
    "q64_wav_stereo" ->
      """WITH s AS (SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 2 = 0
        |    THEN ((d.doc_id * 7 + t.j * 13) % 256 - 128) / 128.0
        |    ELSE (((d.doc_id * 7 + t.j * 13) * 257) % 65536 - 32768)
        |      / 32768.0 END AS x
        |  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
        |  CROSS JOIN generate_series(0, 63) t(j)
        |  WHERE t.j < 2 * (d.doc_id % 32 + 1))
        |SELECT doc_id, CAST(2 AS BIGINT) AS channels,
        |  CAST(doc_id % 32 + 1 AS BIGINT) AS n_frames,
        |  round(sqrt(avg(x * x)), 6) AS rms,
        |  round(max(abs(x)), 6) AS peak
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q58: the REAL MP4 sample-table demux against closed-form frame
    // geometry: frame i of doc d has size (d%7+1+i%3)*8, pts i*(d%5+1)*40
    // (timescale 1000), and is filled with byte (d+i)%256 — so byte_sum
    // = size * fill pins that the demuxed offset window covers exactly
    // the frame's bytes. Every second frame (stride 2), all integers.
    "q58_mp4_frames" ->
      """SELECT d.doc_id, CAST(t.i AS BIGINT) AS frame_idx,
        | CAST((d.doc_id % 7 + 1 + t.i % 3) * 8 AS BIGINT) AS size_bytes,
        | CAST(t.i * (d.doc_id % 5 + 1) * 40 AS BIGINT) AS pts_ms,
        | CAST((d.doc_id % 7 + 1 + t.i % 3) * 8
        |   * ((d.doc_id + t.i) % 256) AS BIGINT) AS byte_sum
        |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
        |CROSS JOIN generate_series(0, 15) t(i)
        |WHERE t.i <= d.doc_id % 16 AND t.i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // q62: video frame pixels — every doc's MP4 carries n=(id%4+2)
    // uniform-gray 16x16 JPEG frames (gray (id*31+i*17)%256, delta
    // (id%5+1)*40 at timescale 1000); stride 2 keeps even frame
    // indices, and the decoded mean luminance must round back to the
    // planted gray exactly (uniform JPEG round-trip is lossless)
    "q62_video_frames" ->
      """SELECT d.doc_id, CAST(t.i AS BIGINT) AS frame_idx,
        | CAST(t.i * (d.doc_id % 5 + 1) * 40 AS BIGINT) AS pts_ms,
        | CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        | CAST((d.doc_id * 31 + t.i * 17) % 256 AS BIGINT) AS gray
        |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
        |CROSS JOIN generate_series(0, 5) t(i)
        |WHERE t.i < d.doc_id % 4 + 2 AND t.i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // q63: flat-image brightness separation — every image has dHash 0,
    // so only the brightness bucket join can shape the clusters: the
    // ±1-gray variants of a class merge (within tol, across bucket
    // boundaries via two-bucket emission), distinct classes (>= 12
    // gray levels apart) stay separate; fixed point = class-min id
    "q63_flat_dedup" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | min(doc_id) OVER (PARTITION BY doc_id % 20) AS cluster_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q59: image near-dup clusters — docs sharing doc_id%50 carry
    // IDENTICAL planted images, so the decode->dHash->band->contraction
    // pipeline must assign each doc the class-min doc_id; the oracle
    // needs no pixels, just the planted class structure
    "q59_image_dedup" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | min(doc_id) OVER (PARTITION BY doc_id % 50) AS cluster_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q60: image NEAR-dup clusters — variants of one class carry
    // DISTINCT planted dHashes at Hamming 1-3 from the class base, so
    // only the banded Hamming join (not the exact collapse) can merge
    // them; the fixed point is still the class-min doc_id. Any band
    // recall miss splits a class; any verify admitting distance > 3
    // merges classes — either changes this window min.
    "q60_image_neardup" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | min(doc_id) OVER (PARTITION BY doc_id % 50) AS cluster_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q54: temperature rebalancing — same counts, same correctly-rounded
    // sqrt threshold, same md5-bucket acceptance as temperatureSample
    "q54_temp_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1),
        |m AS (SELECT min(n) AS mn FROM c),
        |t AS (SELECT lang, CAST(floor(sqrt(CAST(mn AS DOUBLE)
        |    / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS thr FROM c, m),
        |k AS (SELECT d.lang, d.doc_id, t.thr
        |  FROM documents d JOIN t USING (lang)
        |  WHERE CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))
        |    AS BIGINT) % 1000000 < t.thr)
        |SELECT lang, count(*) AS n_kept, max(thr) AS keep_threshold,
        |  max(doc_id) AS max_kept_id
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // q43: the md5-bucket split assignment reproduced exactly — same
    // hash, same modulus, same rounded cumulative-weight boundaries
    "q43_hash_split" ->
      """WITH b AS (SELECT doc_id, text,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT)
        |    % 1000 AS bucket FROM documents),
        |s AS (SELECT CASE WHEN bucket < 800 THEN 'train'
        |             WHEN bucket < 900 THEN 'val'
        |             ELSE 'test' END AS split,
        |       len(string_split(text, ' ')) AS ntok FROM b)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // q44: keep the 30 smallest doc_ids per source, then summarize
    "q44_source_cap" ->
      """WITH r AS (SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY doc_id) AS rk FROM documents)
        |SELECT source, count(*) AS n_kept, max(doc_id) AS max_kept_id
        |FROM r WHERE rk <= 30 GROUP BY 1 ORDER BY 1""".stripMargin,

    // q46: word-level repetition fractions, same bigram construction
    // (1-based adjacent pairs) and 6-dp rounding as the Spark plan
    "q46_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id,
        |  round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws), 6)
        |    AS dwf,
        |  list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |    AS bgs FROM w),
        |e AS (SELECT doc_id, dwf, unnest(bgs) AS bg FROM b),
        |c AS (SELECT doc_id, any_value(dwf) AS dwf, bg, count(*) AS cnt
        |  FROM e GROUP BY doc_id, bg)
        |SELECT doc_id, any_value(dwf) AS dup_word_frac,
        |  round(CAST(max(cnt) AS DOUBLE)/sum(cnt), 6) AS top_bigram_frac,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
        |    /sum(cnt), 6) AS rep_bigram_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q47: same unigram model — corpus word counts over the same
    // whitespace tokens, same log10 mean, 6-dp rounding
    "q47_unigram_lm" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (SELECT w, count(*) AS cnt FROM w GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c)
        |SELECT doc_id, count(*) AS n_words,
        |  round(avg(log10(cnt/total)), 6) AS mean_log10p
        |FROM w JOIN c USING (w) CROSS JOIN t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q48: same whitespace tokens, same 13-gram windows (no short-doc
    // fallback: generate_series(1, len-12) is empty below 13 words),
    // same md5 32-bit gram hash as the Spark side
    "q48_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, [array_to_string(w[i:i+12], ' ')
        |   for i in generate_series(1, len(w)-12)] AS gs FROM t),
        |cg AS (SELECT doc_id, CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 20 <> 0)),
        |bg AS (SELECT DISTINCT CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) AS h
        |  FROM (SELECT unnest(gs) AS g FROM g WHERE doc_id % 20 = 0)),
        |bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (h))
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,

    // q49: same whitespace token counts; the two-pass bucketed prefix
    // sum must equal the plain global window sum, shard = offset // budget
    "q49_shard_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS tok_offset FROM t)
        |SELECT doc_id, n_tokens, tok_offset,
        |  tok_offset // 1000 AS shard_id
        |FROM p ORDER BY doc_id""".stripMargin,

    // q42: the streaming custom-state sessionization must reproduce the
    // batch transitive gap closure — the oracle IS q12's sessionization
    // (same 30-min gap, same counts), computed the window-function way.
    // Rows with null identity/time can't sessionize (documented contract
    // of sessionizeToCompletion) — the oracle filters them identically,
    // so the equivalence holds by construction on null-containing data.
    "q42_stream_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL),
        |m AS (SELECT user_id,
        |  CASE WHEN lag(tus) OVER w IS NULL THEN 1
        |       WHEN tus - lag(tus) OVER w > 1800*1000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // q40: the star-contraction path must produce the identical
    // transitive closure
    "q40_dedup_star" ->
      dedupClosureSql,

    // q38: the streaming watermarked dedup reads every event twice and
    // must emit exactly the single-copy distinct rows DuckDB sees. The
    // watermark operator drops rows whose event time is null (Spark
    // semantics — they cannot be ordered against the watermark), so the
    // oracle filters identically.
    "q38_stream_dedup" ->
      """SELECT event_id, event_type, round(value, 2) AS value_r
        |FROM events WHERE ts IS NOT NULL ORDER BY event_id""".stripMargin,

    // q39: WAV/MP4 payloads are built from these exact doc-derived
    // formulas and parsed back by the real header decoders; DuckDB
    // computes the formulas directly
    "q39_av_meta" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb
        |  FROM documents),
        |m AS (SELECT
        |  CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN doc_id % 2 = 0 THEN 8000 * (1 + nb % 3) ELSE 0 END
        |    AS sample_rate,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 + nb % 2 ELSE 0 END AS channels,
        |  CASE WHEN doc_id % 2 = 0 THEN 8 * (1 + nb % 2) ELSE 0 END AS bits,
        |  CASE WHEN doc_id % 2 = 0 THEN nb ELSE 0 END AS n_frames,
        |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE nb * 10 END AS duration_ms,
        |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE nb % 128 + 16 END AS width,
        |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE nb % 96 + 16 END AS height
        | FROM d)
        |SELECT kind, CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(bits AS BIGINT) AS bits,
        |  count(*) AS n_assets,
        |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
        |  CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms,
        |  CAST(sum(width) AS BIGINT) AS sum_width,
        |  CAST(sum(height) AS BIGINT) AS sum_height
        |FROM m GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin)

  /** Mirror of `SparkEntry.q51_pii_redact`: the same deterministic PII
    * augmentation, the same RE2/Java-common patterns (interpolated from
    * the TextOps constants so they can never drift), the same
    * email → phone → IPv4 redaction order, and the md5-derived checksum
    * of the redacted text — so the oracle verifies redacted bytes, not
    * just counts. */
  private def q51Sql: String = {
    import graft.operators.TextOps.{EmailPattern, PhonePattern, Ipv4Pattern}
    s"""WITH a AS (SELECT source, text || ' reach user'
       |  || CAST(doc_id AS VARCHAR)
       |  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com or +1-555-'
       |  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       |  || CAST(doc_id % 100 AS VARCHAR) AS aug FROM documents),
       |r AS (SELECT source,
       |  len(regexp_extract_all(aug, '$EmailPattern')) AS ne,
       |  len(regexp_extract_all(aug, '$PhonePattern')) AS np,
       |  len(regexp_extract_all(aug, '$Ipv4Pattern')) AS ni,
       |  regexp_replace(regexp_replace(regexp_replace(aug,
       |    '$EmailPattern', '[EMAIL]', 'g'), '$PhonePattern', '[PHONE]',
       |    'g'), '$Ipv4Pattern', '[IP]', 'g') AS red FROM a)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(ne) AS BIGINT) AS n_emails,
       |  CAST(sum(np) AS BIGINT) AS n_phones,
       |  CAST(sum(ni) AS BIGINT) AS n_ips,
       |  CAST(sum(CAST(('0x'||substr(md5(red),1,8)) AS BIGINT)) AS BIGINT)
       |    AS redact_checksum
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Mirror of `SparkEntry.q52_para_dedup` / `TextOps.paragraphDedup`:
    * the same doubled corpus (ids +1e9, first 36 words), the same
    * 12-word paragraph chunking (inclusive list slices = Spark's
    * `slice(ws, start, len)`), and keep-the-earliest by (doc_id, pos)
    * over md5 paragraph hashes. */
  private def q52Sql: String =
    """WITH d AS (SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000000,
      |    array_to_string(string_split(text,' ')[1:36], ' ')
      |  FROM documents),
      |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
      |p AS (SELECT doc_id, list_transform(
      |    range(1, CAST(ceil(len(ws)/12.0) AS INT) + 1),
      |    i -> array_to_string(ws[((i-1)*12+1):(i*12)], ' ')) AS ps
      |  FROM w),
      |o AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(ps)+1),
      |      i -> {'pos': i, 'para': ps[i]})) AS u FROM p),
      |f AS (SELECT doc_id, u.pos AS pos, md5(u.para) AS h FROM o),
      |r AS (SELECT doc_id, h,
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
      |  FROM f)
      |SELECT doc_id, count(*) AS n_paras,
      |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN rk = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dup
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirror of `SparkEntry.q53_kmeans` / `Similarity.kmeansFixedPoint`
    * with k=4, iters=2: the full fixed-point Lloyd loop replayed in SQL
    * — same floor(x·1e6) quantization, exact long squared-L2 argmin
    * (ties to the lower cell), exact integer floor-division centroid
    * updates (the pmod trick keeps `//`'s truncation irrelevant:
    * the adjusted numerator divides exactly), empty cells inheriting
    * the previous centroid. Assignments a1/a2 drive updates c1/c2; the
    * output is the final assignment under c2. */
  private def q53Sql: String = kmeansLoopSql(
    """c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
      |    qv AS cent
      |  FROM (SELECT id, qv FROM v ORDER BY id LIMIT 4))""".stripMargin)

  /** Shared Lloyd-loop replay (see [[q53Sql]] doc above): everything but
    * the seed-pick is identical between the lowest-id init (q53) and the
    * seeded-sample init (q55), so both gates share this builder and only
    * inject the CTE chain that defines `c0(cell, cent)`. */
  private def kmDist(v: String, c: String, d: Int = 64) =
    s"list_sum(list_transform(range(1,${d + 1}), " +
      s"j -> ($v[j]-$c[j])*($v[j]-$c[j])))"
  private def kmAsg(name: String, ct: String, src: String = "v",
      d: Int = 64) = {
    val dist = kmDist(s"$src.qv", s"$ct.cent", d)
    s"""$name AS (SELECT id, qv, cell, dist FROM (
       |  SELECT $src.id, $src.qv, $ct.cell, $dist AS dist,
       |    row_number() OVER (PARTITION BY $src.id ORDER BY $dist, $ct.cell)
       |      AS rk
       |  FROM $src, $ct) WHERE rk = 1)""".stripMargin
  }
  private def kmUpd(name: String, a: String, prev: String,
      d: Int = 64) =
    s"""${name}s AS (SELECT cell, jj.j AS pos, sum(qv[jj.j]) AS sm,
       |    count(*) AS cnt
       |  FROM $a, (SELECT unnest(range(1,${d + 1})) AS j) jj GROUP BY 1, 2),
       |$name AS (SELECT p.cell, coalesce(u.cent, p.cent) AS cent
       |  FROM $prev p
       |  LEFT JOIN (SELECT cell,
       |      list(CAST((sm - ((sm % cnt) + cnt) % cnt) // cnt AS BIGINT)
       |        ORDER BY pos) AS cent
       |    FROM ${name}s GROUP BY cell) u USING (cell))""".stripMargin

  /** The shared training-chain CTEs (quantized vectors `v`, init
    * `c0`, two assignment/update rounds ending at trained centroids
    * `c2`) — used by both the k-means summaries and the trained-IVF
    * oracle (q65). */
  private def kmeansTrainCtes(initCtes: String): String =
    s"""v AS (SELECT vec_id AS id, list_transform(range(1,65),
       |    j -> CAST(floor(CAST(embedding[j] AS DOUBLE)*1000000) AS BIGINT))
       |      AS qv
       |  FROM embeddings
       |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
       |$initCtes,
       |${kmAsg("a1", "c0")},
       |${kmUpd("c1", "a1", "c0")},
       |${kmAsg("a2", "c1")},
       |${kmUpd("c2", "a2", "c1")}""".stripMargin

  private def kmeansLoopSql(initCtes: String): String =
    s"""WITH ${kmeansTrainCtes(initCtes)},
       |${kmAsg("a3", "c2")}
       |SELECT CAST(a3.cell AS BIGINT) AS cell_id, count(*) AS n_vectors,
       |  CAST(sum(a3.dist) AS BIGINT) AS sum_dist,
       |  CAST(max(cs.s) AS BIGINT) AS cent_sum
       |FROM a3 JOIN (SELECT cell, list_sum(cent) AS s FROM c2) cs
       |  USING (cell)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Trained-IVF oracle (`SparkEntry.q65_ann_ivf_trained` /
    * `Similarity.ivfTopKTrained`): the SAME training chain as q53's
    * oracle produces the centroids, which de-quantize as cent/1e6
    * (one correctly-rounded IEEE division per component), get
    * left-fold norms, and drive the q41-shaped assignment / 2-probe /
    * exact-rerank — every cosine and tie reproduced bit-for-bit. */
  private def q65Sql: String = {
    def cos(vec: String, nrm: String) =
      s"""(list_reduce(list_transform(range(1,65),
         |       j -> $vec[j] * cn.cvec[j]), (a, x) -> a + x)
         |     / ($nrm * cn.cnrm))""".stripMargin
    s"""WITH ${kmeansTrainCtes(
        """c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
          |    qv AS cent
          |  FROM (SELECT id, qv FROM v ORDER BY id LIMIT 4))""".stripMargin)},
       |cd AS (SELECT cell, list_transform(cent, x -> x / 1000000.0)
       |    AS cvec FROM c2),
       |cn AS (SELECT cell, cvec,
       |    sqrt(list_reduce(list_transform(cvec, x -> x * x),
       |      (a, x) -> a + x)) AS cnrm
       |  FROM cd),
       |vv AS (SELECT vec_id AS id,
       |    list_transform(range(1,65),
       |      j -> CAST(embedding[j] AS DOUBLE)) AS vec
       |  FROM embeddings),
       |n AS (SELECT id, vec,
       |    sqrt(list_reduce(list_transform(vec, x -> x * x),
       |      (a, x) -> a + x)) AS nrm
       |  FROM vv),
       |casg AS (SELECT id, cell FROM (
       |    SELECT n.id, cn.cell, row_number() OVER (
       |        PARTITION BY n.id ORDER BY
       |        ${cos("n.vec", "n.nrm")} DESC, cn.cell) AS rk
       |    FROM n, cn) WHERE rk = 1),
       |qprb AS (SELECT id, cell FROM (
       |    SELECT n.id, cn.cell, row_number() OVER (
       |        PARTITION BY n.id ORDER BY
       |        ${cos("n.vec", "n.nrm")} DESC, cn.cell) AS rk
       |    FROM n, cn WHERE n.id < 16) WHERE rk <= 2),
       |pairs AS (SELECT q.id AS query_id, c.id AS cand_id,
       |    (list_reduce(list_transform(range(1,65),
       |       j -> q.vec[j] * c.vec[j]), (a, x) -> a + x)
       |     / (q.nrm * c.nrm)) AS sim
       |  FROM qprb JOIN casg ON qprb.cell = casg.cell
       |  JOIN n q ON q.id = qprb.id
       |  JOIN n c ON c.id = casg.id),
       |ranked AS (SELECT query_id, cand_id, sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
       |  FROM pairs)
       |SELECT query_id, cand_id, round(sim, 6) AS sim_r,
       |  CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ oracle (`SparkEntry.q66_ann_ivfpq` /
    * `Similarity.ivfPqTopK`): the q41 coarse quantizer (8 lowest-id
    * vectors, cosine assignment / 2-probe), four per-block Lloyd
    * trainings (the q53 arithmetic on 16-dim slices of the quantized
    * vectors, k=4, 2 iterations, lowest-id init), exact-long encode
    * (nearest sub-centroid per block, ties to the lower code = lower
    * cell), exact-long ADC (sum of the four block squared-L2s against
    * the CODED sub-centroids, top-8 per query, ties to the lower
    * cand_id), and the shared exact-cosine rerank — every stage
    * replayed bit-for-bit. */
  private def q66Sql: String = ivfPqSql(residual = false)

  /** Residual-IVFADC oracle (`SparkEntry.q72_ann_ivfadc`): the q66
    * replay with PQ applied to `qv − cell's quantized centroid` — the
    * `qc`/`rbase` CTEs build the residual frame (inner joins mirror
    * the Spark side's quantizer-projection joins), the block
    * trainings run over residual slices, and the ADC subtracts the
    * probed cell's centroid from the query inline (two exact long
    * subtractions, same association order as VecSubLong + PqAdcDist). */
  private def q72Sql: String = ivfPqSql(residual = true)

  /** Trained-coarse residual-IVFADC oracle
    * (`SparkEntry.q73_ann_ivfadc_trained`): the q53 training chain
    * (lowest-id init, 2 rounds → c2) provides BOTH the cosine coarse
    * quantizer (de-quantized, q65's construction) and the exact
    * quantized centroids the residual frame subtracts (c2 directly —
    * already fixed-point, no extra rounding anywhere). */
  private def q73Sql: String = ivfPqSql(residual = true, trained = true)

  /** Seed-coarse cosine-assignment CTEs shared by the IVF-family
    * oracles (ivfPqSql's seed branch, q71): `cent` = the nCells
    * lowest-id vectors, `casg` = every vector's best-cosine cell
    * (ties to the lower cell_id), `qprb` = each query's nProbe best
    * cells, with the query set narrowed by `queryFilter` (empty = all
    * vectors are queries). ONE definition so a tie-break or
    * arithmetic fix can never reach only some gates. `nCellsExpr` is
    * a SQL expression (a constant, or q71's self-sizing LIMIT
    * subquery). */
  private def seedCoarseCtes(nCellsExpr: String, nProbe: Int,
      queryFilter: String): String = {
    val cos =
      s"""(list_reduce(list_transform(range(1,65),
         |           j -> n.vec[j] * cent.cvec[j]), (a, x) -> a + x)
         |         / (n.nrm * cent.cnrm))""".stripMargin
    s"""cent AS (SELECT id AS cell_id, vec AS cvec, nrm AS cnrm
       |  FROM n ORDER BY id LIMIT $nCellsExpr),
       |casg AS (SELECT id, cell_id FROM (
       |    SELECT n.id, cent.cell_id, row_number() OVER (
       |        PARTITION BY n.id ORDER BY
       |        $cos DESC, cent.cell_id) AS rk
       |    FROM n, cent) WHERE rk = 1),
       |qprb AS (SELECT id, cell_id FROM (
       |    SELECT n.id, cent.cell_id, row_number() OVER (
       |        PARTITION BY n.id ORDER BY
       |        $cos DESC, cent.cell_id) AS rk
       |    FROM n, cent$queryFilter) WHERE rk <= $nProbe)""".stripMargin
  }

  /** Shared IVF-PQ replay (gates q66/q72): coarse quantizer (8
    * lowest-id vectors, cosine assignment / 2-probe), four per-block
    * Lloyd trainings (q53 arithmetic, 16-dim slices, k=4, 2
    * iterations, lowest-id init), exact-long encode (ties to the
    * lower code), exact-long ADC (top-8 per query, ties to the lower
    * cand_id), exact-cosine rerank. `residual` switches the PQ frame
    * from raw quantized vectors to per-cell residuals; `trained`
    * switches the coarse quantizer from the 8 lowest-id vectors to
    * the q53 Lloyd chain's 4 trained centroids (q65's de-quantized
    * cosine construction, with c2 doubling as the exact residual
    * frame). */
  private def ivfPqSql(residual: Boolean,
      trained: Boolean = false): String = {
    val m = 4
    val bl = 16 // block length (dim 64 / m)
    val src = if (residual) "rbase" else "v"
    // per-block training chain: sliced quantized (residual) vectors,
    // lowest-id init, two assignment/update rounds, then the full
    // encode assignment against the trained codebook
    val blockCtes = (0 until m).map { b =>
      val off = b * bl
      s"""v$b AS (SELECT id, qv[${off + 1}:${off + bl}] AS qv FROM $src),
         |cb${b}0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
         |    qv AS cent
         |  FROM (SELECT id, qv FROM v$b ORDER BY id LIMIT 4)),
         |${kmAsg(s"a${b}1", s"cb${b}0", s"v$b", bl)},
         |${kmUpd(s"cb${b}1", s"a${b}1", s"cb${b}0", bl)},
         |${kmAsg(s"a${b}2", s"cb${b}1", s"v$b", bl)},
         |${kmUpd(s"cb${b}2", s"a${b}2", s"cb${b}1", bl)},
         |${kmAsg(s"e$b", s"cb${b}2", s"v$b", bl)}""".stripMargin
    }.mkString(",\n")
    val encJoin = (1 until m).map(b => s"JOIN e$b USING (id)")
      .mkString(" ")
    val encCols = (0 until m).map(b => s"e$b.cell AS c$b").mkString(", ")
    // ADC: block b's exact-long squared L2 between the query's
    // (residual) slice and the candidate's coded sub-centroid
    val qSlice = (off: Int) =>
      if (residual) s"(vq.qv[$off+j] - qc.cqv[$off+j])"
      else s"vq.qv[$off+j]"
    val adcSum = (0 until m).map { b =>
      val off = b * bl
      s"""list_sum(list_transform(range(1,${bl + 1}),
         |       j -> (${qSlice(off)}-b$b.cent[j])*(${qSlice(off)}-b$b.cent[j])))"""
        .stripMargin
    }.mkString("\n     + ")
    val bookJoins = (0 until m).map(b =>
      s"JOIN cb${b}2 b$b ON b$b.cell = enc.c$b").mkString("\n  ")
    val qcJoin =
      if (residual) "\n  JOIN qc ON qc.cell_id = q.cell_id" else ""
    val qcCte =
      if (trained)
        """qc AS (SELECT cell AS cell_id, cent AS cqv FROM c2)"""
      else
        """qc AS (SELECT cent.cell_id, v.qv AS cqv
          |  FROM cent JOIN v ON v.id = cent.cell_id)""".stripMargin
    val residualCtes = if (!residual) "" else
      s""",
         |$qcCte,
         |rbase AS (SELECT c.id, list_transform(range(1,65),
         |    j -> v.qv[j] - qc2.cqv[j]) AS qv
         |  FROM casg c JOIN v ON v.id = c.id
         |  JOIN qc qc2 ON qc2.cell_id = c.cell_id)""".stripMargin
    // head: the quantized-vector CTE — plain `v` for the seed coarse
    // quantizer, or the full q53 training chain (which begins with the
    // identical `v`) when the coarse stage is trained
    val headCtes =
      if (!trained)
        """v AS (SELECT vec_id AS id, list_transform(range(1,65),
          |    j -> CAST(floor(CAST(embedding[j] AS DOUBLE)*1000000) AS BIGINT))
          |      AS qv
          |  FROM embeddings
          |  WHERE vec_id IS NOT NULL AND len(embedding) = 64)""".stripMargin
      else kmeansTrainCtes(
        """c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
          |    qv AS cent
          |  FROM (SELECT id, qv FROM v ORDER BY id LIMIT 4))""".stripMargin)
    // coarse cosine quantizer: 8 lowest-id vectors, or the trained
    // centroids de-quantized (q65's construction) with `cell` renamed
    // to the shared `cell_id`
    def cosTo(cv: String, cn: String) =
      s"""(list_reduce(list_transform(range(1,65),
         |           j -> n.vec[j] * $cv[j]), (a, x) -> a + x)
         |         / (n.nrm * $cn))""".stripMargin
    val coarseCtes =
      if (!trained)
        seedCoarseCtes("8", 2, " WHERE n.id < 16")
      else
        s"""cd AS (SELECT cell, list_transform(cent, x -> x / 1000000.0)
           |    AS cvec FROM c2),
           |cn AS (SELECT cell, cvec,
           |    sqrt(list_reduce(list_transform(cvec, x -> x * x),
           |      (a, x) -> a + x)) AS cnrm
           |  FROM cd),
           |casg AS (SELECT id, cell_id FROM (
           |    SELECT n.id, cn.cell AS cell_id, row_number() OVER (
           |        PARTITION BY n.id ORDER BY
           |        ${cosTo("cn.cvec", "cn.cnrm")} DESC, cn.cell) AS rk
           |    FROM n, cn) WHERE rk = 1),
           |qprb AS (SELECT id, cell_id FROM (
           |    SELECT n.id, cn.cell AS cell_id, row_number() OVER (
           |        PARTITION BY n.id ORDER BY
           |        ${cosTo("cn.cvec", "cn.cnrm")} DESC, cn.cell) AS rk
           |    FROM n, cn WHERE n.id < 16) WHERE rk <= 2)""".stripMargin
    def cos(q: String, c: String) =
      s"""(list_reduce(list_transform(range(1,65),
         |       j -> $q.vec[j] * $c.vec[j]), (a, x) -> a + x)
         |     / ($q.nrm * $c.nrm))""".stripMargin
    s"""WITH $headCtes,
       |vv AS (SELECT vec_id AS id,
       |    list_transform(range(1,65),
       |      j -> CAST(embedding[j] AS DOUBLE)) AS vec
       |  FROM embeddings
       |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
       |n AS (SELECT id, vec, nrm FROM (SELECT id, vec,
       |    sqrt(list_reduce(list_transform(vec, x -> x * x),
       |      (a, x) -> a + x)) AS nrm
       |  FROM vv) WHERE nrm > 0 AND isfinite(nrm)),
       |$coarseCtes$residualCtes,
       |$blockCtes,
       |enc AS (SELECT e0.id, $encCols FROM e0 $encJoin),
       |adcp AS (SELECT q.id AS query_id, c.id AS cand_id,
       |    ($adcSum) AS adc
       |  FROM qprb q
       |  JOIN casg c ON q.cell_id = c.cell_id
       |  JOIN enc ON enc.id = c.id
       |  JOIN v vq ON vq.id = q.id$qcJoin
       |  $bookJoins),
       |adct AS (SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id, row_number() OVER (
       |        PARTITION BY query_id ORDER BY adc, cand_id) AS rk
       |    FROM adcp) WHERE rk <= 8),
       |pairs AS (SELECT t.query_id, t.cand_id, ${cos("q", "c")} AS sim
       |  FROM adct t JOIN n q ON q.id = t.query_id
       |  JOIN n c ON c.id = t.cand_id),
       |ranked AS (SELECT query_id, cand_id, sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
       |  FROM pairs)
       |SELECT query_id, cand_id, round(sim, 6) AS sim_r,
       |  CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Shared BM25 scoring CTEs (`SparkEntry.q68_bm25` / `q69_rrf_hybrid`
    * ↔ `Ranking.bm25`): whitespace tokens, one tf row per corpus doc,
    * a single corpus-stats row, and the score as the SAME fixed-order
    * double expression the Spark side builds — every derived constant
    * (k1+1, 1-b) is computed in driver Scala and embedded via
    * `Double.toString` (which round-trips), so both engines evaluate
    * identical bits. Ends at `sc(doc_id, dlen, score)`. */
  private def bm25Ctes(terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): String = {
    val k1p1 = (k1 + 1.0).toString
    val oneMinusB = (1.0 - b).toString
    val tfCases = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN word = '$t' THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS tf$i"
    }.mkString(",\n    ")
    val dfSums = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS df$i").mkString(",\n    ")
    val contribs = terms.indices.map { i =>
      s"""ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(st.df$i AS DOUBLE) + 0.5)
         |       / (CAST(st.df$i AS DOUBLE) + 0.5))
         |     * (CAST(tf.tf$i AS DOUBLE) * $k1p1)
         |     / (CAST(tf.tf$i AS DOUBLE) + $k1 * ($oneMinusB
         |        + $b * CAST(tf.dlen AS DOUBLE)
         |          / (CAST(st.sumlen AS DOUBLE) / CAST(st.n AS DOUBLE))))"""
        .stripMargin
    }.mkString("\n   + ")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |wd AS (SELECT doc_id, len(ws) AS dlen, unnest(ws) AS word FROM tk),
       |tf AS (SELECT doc_id, dlen,
       |    $tfCases
       |  FROM wd GROUP BY 1, 2),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dlen) AS BIGINT) AS sumlen,
       |    $dfSums
       |  FROM tf),
       |sc AS (SELECT tf.doc_id, tf.dlen, (0.0
       |   + $contribs) AS score
       |  FROM tf, st)""".stripMargin
  }

  private def q68Sql: String =
    s"""WITH ${bm25Ctes(SparkEntry.Bm25Terms)},
       |top AS (SELECT doc_id, score, row_number() OVER (
       |    ORDER BY score DESC, doc_id) AS rank FROM sc)
       |SELECT doc_id, round(score, 6) AS score_r, CAST(rank AS INT) AS rank
       |FROM top WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** RRF hybrid oracle: BM25 top-50 (the q68 chain) fused with the
    * exact cosine top-50 against query vector 0 (the q27 brute-force
    * arithmetic, UNROUNDED ranking like the q41 family), rrf =
    * 1/(60+rank) summed lexical-then-vector, absent ranks as 0. */
  private def q69Sql: String =
    s"""WITH ${bm25Ctes(SparkEntry.Bm25Terms)},
       |bmr AS (SELECT doc_id, rank FROM (
       |    SELECT doc_id, row_number() OVER (
       |        ORDER BY score DESC, doc_id) AS rank FROM sc)
       |  WHERE rank <= 50),
       |$embCte,
       |vp AS (SELECT c.vec_id AS doc_id,
       |    ${dot("q", "c")} / (q.nrm * c.nrm) AS sim
       |  FROM e q, e c WHERE q.vec_id = 0),
       |vr AS (SELECT doc_id, rank FROM (
       |    SELECT doc_id, row_number() OVER (
       |        ORDER BY sim DESC, doc_id) AS rank FROM vp)
       |  WHERE rank <= 50),
       |f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |    a.rank AS ra, b.rank AS rb
       |  FROM bmr a FULL OUTER JOIN vr b ON a.doc_id = b.doc_id),
       |sc2 AS (SELECT doc_id, ra, rb,
       |    (coalesce(1.0 / CAST(60 + ra AS DOUBLE), 0.0)
       |     + coalesce(1.0 / CAST(60 + rb AS DOUBLE), 0.0)) AS rrf
       |  FROM f),
       |top AS (SELECT doc_id, ra, rb, rrf, row_number() OVER (
       |    ORDER BY rrf DESC, doc_id) AS rank FROM sc2)
       |SELECT doc_id, CAST(coalesce(ra, 0) AS INT) AS rank_bm25,
       |  CAST(coalesce(rb, 0) AS INT) AS rank_vec,
       |  round(rrf, 6) AS rrf_r, CAST(rank AS INT) AS rank
       |FROM top WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** Stratified-sample oracle (`SparkEntry.q67_sample_stratified` /
    * `TextOps.stratifiedSample`): the q55 xxhash64 chain replayed over
    * doc_id (hash(id, 42) then hash(7, prev)), pmod 100, per-lang rate
    * CASE — the kept SET pinned via id and char checksums.
    *
    * `hx` must be MATERIALIZED: filtering on the hash column would
    * otherwise push the predicate down through the ~24 chained hash
    * CTEs, re-substituting each step (every xor/mul references its
    * input twice) into an exponentially-growing expression — the same
    * planner blowup [[xxh64Ctes]] documents for lateral aliases,
    * reached through filter pushdown instead (q55 never hits it
    * because its chain ends in ORDER BY ... LIMIT, not WHERE). */
  private def q67Sql: String = {
    val toU = "(CAST(id AS HUGEINT) + CASE WHEN id < 0 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    val (d1, last1, h1) = xxh64Ctes("d", toU, "42::HUGEINT", "xa")
    val (d2, last2, h2) = xxh64Ctes(last1, "7::HUGEINT", h1, "xb")
    s"""WITH d AS (SELECT doc_id AS id, lang, n_chars FROM documents
       |  WHERE doc_id IS NOT NULL),
       |${(d1 ++ d2).mkString(",\n")},
       |hx AS MATERIALIZED (SELECT id, lang, n_chars,
       |    ((${xxh64SignedSql(h2)} % 100) + 100) % 100 AS hm
       |  FROM $last2),
       |k AS (SELECT * FROM hx WHERE hm <
       |    CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 40
       |         ELSE 60 END)
       |SELECT lang, count(*) AS n_kept,
       |  CAST(sum(id) AS BIGINT) AS kept_id_sum,
       |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |FROM k GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
  }

  /** Corpus-profile oracle (`SparkEntry.q70_corpus_profile` /
    * `TextOps.corpusProfile`): the same histogram construction —
    * distinct (stratum, token count) with doc counts, cumulative sum
    * in length order, nearest-rank percentile = the smallest length
    * whose cumulative count reaches ceil(p·n/100) (integer
    * arithmetic, so both engines pick the identical bucket). */
  /** Shared by q75 (AsofJoin.backward) and q81 (its backwardRange
    * skew-robust twin): one oracle text, two engine paths that must be
    * result-indistinguishable. */
  private def q75Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
      |    event_type, value
      |  FROM events
      |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      |    AND ts IS NOT NULL),
      |c AS (SELECT event_id, user_id, tus, value FROM e
      |  WHERE event_type = 'click'),
      |v0 AS (SELECT user_id, tus, value, event_id, row_number()
      |    OVER (PARTITION BY user_id, tus ORDER BY event_id DESC)
      |    AS rk
      |  FROM e WHERE event_type = 'view'),
      |v AS (SELECT user_id, tus, value FROM v0 WHERE rk = 1),
      |j AS (SELECT c.user_id, c.event_id, c.tus, c.value,
      |    v.tus AS vtus, v.value AS vvalue
      |  FROM c ASOF LEFT JOIN v
      |    ON c.user_id = v.user_id AND c.tus >= v.tus)
      |SELECT user_id, event_id, tus, value,
      |  vtus AS view_tus, vvalue AS view_value,
      |  CASE WHEN vtus IS NOT NULL AND tus - vtus <= 60000000
      |    THEN vtus END AS view60_tus,
      |  CASE WHEN vtus IS NOT NULL AND tus - vtus <= 60000000
      |    THEN vvalue END AS view60_value
      |FROM j ORDER BY event_id""".stripMargin

  /** Shared by q76 (AsofJoin.forward) and q82 (forwardRange twin). */
  private def q76Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
      |    event_type, value
      |  FROM events
      |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      |    AND ts IS NOT NULL),
      |c AS (SELECT event_id, user_id, tus, value FROM e
      |  WHERE event_type = 'click'),
      |p0 AS (SELECT user_id, tus, value, event_id, row_number()
      |    OVER (PARTITION BY user_id, tus ORDER BY event_id DESC)
      |    AS rk
      |  FROM e WHERE event_type = 'purchase'),
      |p AS (SELECT user_id, tus, value FROM p0 WHERE rk = 1),
      |j AS (SELECT c.user_id, c.event_id, c.tus, c.value,
      |    p.tus AS ptus, p.value AS pvalue
      |  FROM c ASOF LEFT JOIN p
      |    ON c.user_id = p.user_id AND c.tus <= p.tus)
      |SELECT user_id, event_id, tus, value,
      |  ptus AS next_tus, pvalue AS next_value,
      |  CASE WHEN ptus IS NOT NULL AND ptus - tus <= 3600000000
      |    THEN ptus END AS next1h_tus,
      |  CASE WHEN ptus IS NOT NULL AND ptus - tus <= 3600000000
      |    THEN pvalue END AS next1h_value
      |FROM j ORDER BY event_id""".stripMargin

  private def q70Sql: String = {
    val pCols = Seq(50, 90, 99).map(p =>
      s"""min(CASE WHEN cum >= (n * $p + 99) // 100 THEN tokc END)
         |    AS p${p}_tokens""".stripMargin).mkString(",\n  ")
    s"""WITH t AS (SELECT source AS stratum,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokc
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |h AS (SELECT stratum, tokc, CAST(count(*) AS BIGINT) AS c
       |  FROM t GROUP BY 1, 2),
       |cm AS (SELECT stratum, tokc, c,
       |    CAST(sum(c) OVER (PARTITION BY stratum ORDER BY tokc)
       |      AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY stratum) AS BIGINT) AS n
       |  FROM h)
       |SELECT stratum, max(n) AS n_docs,
       |  CAST(sum(tokc * c) AS BIGINT) AS sum_tokens,
       |  min(tokc) AS min_tokens, max(tokc) AS max_tokens,
       |  $pCols
       |FROM cm GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
  }

  /** kNN-label-audit oracle (`SparkEntry.q71_knn_label_audit` /
    * `Similarity.knnClassify`): the q41 IVF search replayed for EVERY
    * vector (self pairs dropped before ranking, k=5), neighbor labels
    * vote with ties to the smallest label, accuracy per true label. */
  private def q71Sql: String = {
    s"""WITH vv AS (SELECT vec_id AS id,
       |    list_transform(range(1,65),
       |      j -> CAST(embedding[j] AS DOUBLE)) AS vec
       |  FROM embeddings),
       |n AS (SELECT id, vec,
       |    sqrt(list_reduce(list_transform(vec, x -> x * x),
       |      (a, x) -> a + x)) AS nrm
       |  FROM vv),
       |${seedCoarseCtes(
          """(
            |    SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)"""
            .stripMargin, 2, "")},
       |pairs AS (SELECT q.id AS query_id, c.id AS cand_id,
       |    (list_reduce(list_transform(range(1,65),
       |       j -> nq.vec[j] * nc.vec[j]), (a, x) -> a + x)
       |     / (nq.nrm * nc.nrm)) AS sim
       |  FROM qprb q JOIN casg c ON q.cell_id = c.cell_id
       |  JOIN n nq ON nq.id = q.id
       |  JOIN n nc ON nc.id = c.id
       |  WHERE q.id <> c.id),
       |nn AS (SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id, row_number() OVER (
       |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
       |    FROM pairs) WHERE rank <= 5),
       |lb AS (SELECT vec_id AS id, label FROM embeddings
       |  WHERE label IS NOT NULL),
       |votes AS (SELECT r.query_id, l.label AS nl, count(*) AS v
       |  FROM nn r JOIN lb l ON l.id = r.cand_id GROUP BY 1, 2),
       |pred AS (SELECT query_id, nl AS pred_label FROM (
       |    SELECT query_id, nl, row_number() OVER (
       |        PARTITION BY query_id ORDER BY v DESC, nl) AS pr
       |    FROM votes) WHERE pr = 1)
       |SELECT o.label, count(*) AS n_vecs,
       |  CAST(sum(CASE WHEN p.pred_label = o.label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_correct,
       |  round(CAST(sum(CASE WHEN p.pred_label = o.label THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS acc_r
       |FROM pred p JOIN lb o ON o.id = p.query_id
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB replay of Spark's `xxhash64(input, lit(seedLit))` over ONE
    * long column: XXH64 of 8 little-endian bytes, seed chained through
    * both children exactly as Catalyst's `XxHash64` folds them
    * (`hashLong(input, 42)` then `hashLong(seedLit, prev)`). All
    * arithmetic is HUGEINT mod 2^64: the wrapping 64-bit multiply
    * splits one operand into 32-bit halves (a full 64×64 product can
    * overflow signed INT128), rotations/shifts are dyadic mul/div, and
    * xor is DuckDB's bitwise `xor` on non-negative HUGEINTs. Each step
    * is its OWN chained CTE — lateral column aliases would textually
    * re-expand every referenced step (2-3 refs per step, ~24 steps:
    * exponential blowup, observed as a planner hang).
    *
    * @return (cte definitions, final cte name, unsigned-hash column);
    *         the caller orders by the SIGNED value (`xxh64SignedSql`)
    *         to match Spark's LongType ordering. */
  private def xxh64Ctes(src: String, inpExpr: String, seedExpr: String,
      tag: String): (Seq[String], String, String) = {
    val HM = "18446744073709551616::HUGEINT"
    val H32 = "4294967296::HUGEINT"
    def mulmod(a: String, b: String) =
      s"(((($a % $H32) * $b) % $HM + (((($a // $H32) * $b) % $H32) * $H32)) % $HM)"
    val P1 = "11400714785074694791::HUGEINT"
    val P2 = "14029467366897019727::HUGEINT"
    val P3 = "1609587929392839161::HUGEINT"
    val P4 = "9650029242287828579::HUGEINT"
    val P5 = "2870177450012600261::HUGEINT"
    var prev = src
    val defs = scala.collection.mutable.ArrayBuffer[String]()
    def add(n: String, expr: String): Unit = {
      val name = s"${tag}_$n"
      defs += s"$name AS (SELECT *, $expr AS $tag$n FROM $prev)"
      prev = name
    }
    add("h0", s"(($seedExpr) + $P5 + 8) % $HM")
    add("k1", mulmod(s"($inpExpr)", P2))
    // rotl(k1, 31): disjoint bit ranges, so + is |
    add("k2", s"((${tag}k1 * 2147483648::HUGEINT) % $HM) + " +
      s"(${tag}k1 // 8589934592::HUGEINT)")
    add("k3", mulmod(s"${tag}k2", P1))
    add("h1", s"xor(${tag}h0, ${tag}k3)")
    // rotl(h1, 27)
    add("h2", s"((${tag}h1 * 134217728::HUGEINT) % $HM) + " +
      s"(${tag}h1 // 137438953472::HUGEINT)")
    add("h3", s"(${mulmod(s"${tag}h2", P1)} + $P4) % $HM")
    // fmix avalanche: ^>>33, *P2, ^>>29, *P3, ^>>32
    add("f1", s"xor(${tag}h3, ${tag}h3 // 8589934592::HUGEINT)")
    add("f2", mulmod(s"${tag}f1", P2))
    add("f3", s"xor(${tag}f2, ${tag}f2 // 536870912::HUGEINT)")
    add("f4", mulmod(s"${tag}f3", P3))
    add("f5", s"xor(${tag}f4, ${tag}f4 // 4294967296::HUGEINT)")
    (defs.toSeq, prev, s"${tag}f5")
  }

  /** Reinterpret an unsigned mod-2^64 hash as Spark's signed long. */
  private def xxh64SignedSql(u: String): String =
    s"($u - (CASE WHEN $u >= 9223372036854775808::HUGEINT " +
      s"THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END))"

  /** Mirror of `SparkEntry.q55_kmeans_seeded`: the q53 loop with the
    * SEEDED init — c0 holds the 4 vectors with the smallest
    * `xxhash64(vec_id, 7L)` (signed order, ties to the lower id),
    * numbered in draw order, replayed via the [[xxh64Ctes]] chain. */
  /** Mirror of `SparkEntry.q94_interval_shuffle`: each interval's
    * placement is `pmod(xxhash64(aid, 7), size - len + 1)` — the hash
    * replayed through [[xxh64Ctes]] (42-seeded first round, literal-7
    * second, as Catalyst folds `xxhash64(aid, lit(7))`), the pmod as
    * `((hs % room) + room) % room` on the SIGNED value, matching
    * Spark's `pmod` on longs. */
  private def q94Sql: String = {
    val toU = "(CAST(aid AS HUGEINT) + CASE WHEN aid < 0 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    val (d1, last1, h1) = xxh64Ctes("a", toU, "42::HUGEINT", "sa")
    val (d2, last2, h2) = xxh64Ctes(last1, "7::HUGEINT", h1, "sb")
    s"""WITH a0 AS ($ivC),
       |sz(chrom, size) AS (SELECT * FROM (VALUES
       |  ('chr0', 11000000), ('chr1', 11000000), ('chr2', 11000000),
       |  ('chr3', 11000000))),
       |a AS (SELECT a0.aid, a0.chrom, a0.astart, a0.aend,
       |    CAST(sz.size AS HUGEINT) AS size
       |  FROM a0 JOIN sz USING (chrom)),
       |${(d1 ++ d2).mkString(",\n")},
       |hx AS (SELECT aid, chrom, size,
       |    least(CAST(aend - astart AS HUGEINT), size) AS len,
       |    ${xxh64SignedSql(h2)} AS hs
       |  FROM $last2),
       |pl AS (SELECT aid, chrom, size, len,
       |    ((hs % (size - len + 1)) + (size - len + 1))
       |      % (size - len + 1) AS ns
       |  FROM hx)
       |SELECT aid, chrom, CAST(ns AS BIGINT) AS "start",
       |  CAST(ns + len AS BIGINT) AS "end"
       |FROM pl ORDER BY aid""".stripMargin
  }

  /** Mirror of `SparkEntry.q95_interval_annotate`: per labeled set,
    * the q88 count + DISTINCT-clipped-islands union length, emitted in
    * long format with zero rows kept. */
  private def q95Sql: String = {
    def perSet(tag: String): String =
      s"""cnt_$tag AS (SELECT a.aid, count(*) AS n
         |  FROM a JOIN bv_$tag b ON a.chrom = b.chrom
         |    AND a.astart < b."end" AND b."start" < a.aend
         |  GROUP BY 1),
         |seg_$tag AS (SELECT DISTINCT a.aid,
         |    greatest(a.astart, b."start") AS cs,
         |    least(a.aend, b."end") AS ce
         |  FROM a JOIN bv_$tag b ON a.chrom = b.chrom
         |    AND a.astart < b."end" AND b."start" < a.aend),
         |sg_$tag AS (SELECT aid, cs, ce,
         |    CASE WHEN max(ce) OVER w IS NULL OR cs > max(ce) OVER w
         |         THEN 1 ELSE 0 END AS new_grp
         |  FROM seg_$tag
         |  WINDOW w AS (PARTITION BY aid ORDER BY cs, ce
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |sh_$tag AS (SELECT aid, cs, ce,
         |    sum(new_grp) OVER (PARTITION BY aid ORDER BY cs, ce
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS grp
         |  FROM sg_$tag),
         |cov_$tag AS (SELECT aid, CAST(sum(me - ms) AS BIGINT) AS c
         |  FROM (SELECT aid, min(cs) AS ms, max(ce) AS me
         |        FROM sh_$tag GROUP BY aid, grp) u
         |  GROUP BY 1)""".stripMargin
    def selSet(tag: String): String =
      s"""SELECT a.aid, '$tag' AS set, a.chrom,
         |  CAST(a.astart AS BIGINT) AS "start",
         |  CAST(a.aend AS BIGINT) AS "end",
         |  coalesce(cnt_$tag.n, 0) AS n_overlaps,
         |  CAST(coalesce(cov_$tag.c, 0) AS BIGINT) AS covered_bases,
         |  CAST(a.aend - a.astart AS BIGINT) AS a_len,
         |  round(coalesce(cov_$tag.c, 0) * 1.0 / (a.aend - a.astart), 6)
         |    AS fraction_r
         |FROM a LEFT JOIN cnt_$tag ON a.aid = cnt_$tag.aid
         |  LEFT JOIN cov_$tag ON a.aid = cov_$tag.aid""".stripMargin
    s"""WITH a AS ($ivC),
       |bv_li AS (SELECT chrom, "start", "end" FROM ($ivA)),
       |bv_ord AS (SELECT chrom, "start", "end" FROM ($ivB)),
       |${perSet("li")},
       |${perSet("ord")}
       |${selSet("li")}
       |UNION ALL
       |${selSet("ord")}
       |ORDER BY aid, set""".stripMargin
  }

  private def q55Sql: String = {
    val toU = "(CAST(id AS HUGEINT) + CASE WHEN id < 0 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    val (d1, last1, h1) = xxh64Ctes("v", toU, "42::HUGEINT", "xa")
    val (d2, last2, h2) = xxh64Ctes(last1, "7::HUGEINT", h1, "xb")
    val initCtes = (d1 ++ d2).mkString(",\n") + ",\n" +
      s"""hx AS (SELECT id, qv, ${xxh64SignedSql(h2)} AS hs FROM $last2),
         |c0 AS (SELECT row_number() OVER (ORDER BY hs, id) - 1 AS cell,
         |    qv AS cent
         |  FROM (SELECT id, qv, hs FROM hx ORDER BY hs, id LIMIT 4))"""
        .stripMargin
    kmeansLoopSql(initCtes)
  }

  /** IVF ANN oracle, mirroring `Similarity.ivfTopK` exactly: the 8
    * lowest-id corpus vectors are the quantizer centroids,
    * every vector is assigned to its best-cosine cell (ties to the
    * lower cell id), queries (vec_id < 16) probe their 2 closest
    * cells, and the exact rerank reuses the same left-fold dot/norm
    * arithmetic, so sims and ranks reproduce bit-for-bit. */
  private def q41Sql: String =
    """WITH v AS (SELECT vec_id AS id,
      |    list_transform(range(1,65),
      |      j -> CAST(embedding[j] AS DOUBLE)) AS vec
      |  FROM embeddings),
      |n AS (SELECT id, vec,
      |    sqrt(list_reduce(list_transform(vec, x -> x * x),
      |      (a, x) -> a + x)) AS nrm
      |  FROM v),
      |cent AS (SELECT id AS cell_id, vec AS cvec, nrm AS cnrm
      |  FROM n ORDER BY id LIMIT 8),
      |casg AS (SELECT id, cell_id FROM (
      |    SELECT n.id, cent.cell_id, row_number() OVER (
      |        PARTITION BY n.id ORDER BY
      |        (list_reduce(list_transform(range(1,65),
      |           j -> n.vec[j] * cent.cvec[j]), (a, x) -> a + x)
      |         / (n.nrm * cent.cnrm)) DESC, cent.cell_id) AS rk
      |    FROM n, cent) WHERE rk = 1),
      |qprb AS (SELECT id, cell_id FROM (
      |    SELECT n.id, cent.cell_id, row_number() OVER (
      |        PARTITION BY n.id ORDER BY
      |        (list_reduce(list_transform(range(1,65),
      |           j -> n.vec[j] * cent.cvec[j]), (a, x) -> a + x)
      |         / (n.nrm * cent.cnrm)) DESC, cent.cell_id) AS rk
      |    FROM n, cent WHERE n.id < 16) WHERE rk <= 2),
      |pairs AS (SELECT q.id AS query_id, c.id AS cand_id,
      |    (list_reduce(list_transform(range(1,65),
      |       j -> q.vec[j] * c.vec[j]), (a, x) -> a + x)
      |     / (q.nrm * c.nrm)) AS sim
      |  FROM qprb JOIN casg ON qprb.cell_id = casg.cell_id
      |  JOIN n q ON q.id = qprb.id
      |  JOIN n c ON c.id = casg.id),
      |ranked AS (SELECT query_id, cand_id, sim, row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
      |  FROM pairs)
      |SELECT query_id, cand_id, round(sim, 6) AS sim_r,
      |  CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** The 4×16-bit band keys of [[graft.operators.Similarity.bandKeys]],
    * one SELECT per band over a CTE exposing (id, vec) — shared by the
    * q33 search and q45 dedup oracles. */
  private def bandKeySelects(src: String): String =
    (0 until 4).map { b =>
      s"SELECT id, $b AS band, ${hpBucketSql("vec", 16, 42L + 7919L * b)}" +
        s" AS key FROM $src"
    }.mkString("\n UNION ALL ")

  /** Banded hyperplane-LSH ANN oracle, mirroring
    * `SparkEntry.q33_ann_banded` / `Similarity.bandedTopK`: the same
    * integer planes and dyadic perturbation multipliers print exactly, and
    * every dot/norm is a `list_reduce` left fold, so candidate sets, sims
    * and ranks are reproduced bit-for-bit. */
  private def q33Sql: String = {
    import graft.operators.Similarity
    val mult = Similarity.perturbMultipliers(99L, 64)
      .mkString("[", ",", "]")
    s"""WITH qv AS (SELECT vec_id AS id,
       |  list_transform(range(1,65),
       |    i -> CAST(embedding[i] AS DOUBLE) * ($mult::DOUBLE[])[i]) AS vec
       | FROM embeddings WHERE vec_id < 16),
       |cv AS (SELECT vec_id AS id,
       |  list_transform(range(1,65), i -> CAST(embedding[i] AS DOUBLE)) AS vec
       | FROM embeddings),
       |qn AS (SELECT id, vec, sqrt(list_reduce(list_transform(vec, x -> x*x),
       |  (a,b) -> a+b)) AS nrm FROM qv),
       |cn AS (SELECT id, vec, sqrt(list_reduce(list_transform(vec, x -> x*x),
       |  (a,b) -> a+b)) AS nrm FROM cv),
       |qk AS (${bandKeySelects("qv")}),
       |ck AS (${bandKeySelects("cv")}),
       |cand AS (SELECT DISTINCT qk.id AS query_id, ck.id AS cand_id
       |  FROM qk JOIN ck ON qk.band = ck.band AND qk.key = ck.key),
       |p AS (SELECT c.query_id, c.cand_id,
       |  list_reduce(list_transform(range(1,65), j -> q.vec[j] * t.vec[j]),
       |    (a,x) -> a+x) / (q.nrm * t.nrm) AS sim
       | FROM cand c JOIN qn q ON c.query_id = q.id
       |   JOIN cn t ON c.cand_id = t.id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank FROM p)
       |SELECT query_id, rank, cand_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Mirror of `SparkEntry.q45_embed_dedup` /
    * `Similarity.embeddingDedupClusters`: the same doubled corpus (ids
    * +1000000000 — collision-free at every SF; a +1000 offset silently
    * collided with base ids at sf0.1 — perturbed by the seed-99
    * multipliers), the same 4×16-bit
    * band keys, the same 6-dp-rounded cosine threshold, and the
    * transitive closure of the surviving pairs (the q37/q40 closure
    * shape). Left-fold `list_reduce` sums keep the float arithmetic
    * identical to Spark's sequential `aggregate`. */
  private def q45Sql: String = {
    val mult = graft.operators.Similarity.perturbMultipliers(99L, 64)
      .mkString("[", ",", "]")
    s"""WITH RECURSIVE base AS (SELECT vec_id AS id,
       |  list_transform(range(1,65),
       |    i -> CAST(embedding[i] AS DOUBLE)) AS vec
       | FROM embeddings),
       |planted AS (SELECT id + 1000000000 AS id,
       |  list_transform(range(1,65),
       |    i -> vec[i] * ($mult::DOUBLE[])[i]) AS vec
       | FROM base),
       |v AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
       |n AS (SELECT id, vec, sqrt(list_reduce(
       |  list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
       |k AS (${bandKeySelects("v")}),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM k a JOIN k b
       |    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
       |pairs AS (SELECT c.id_a, c.id_b
       |  FROM cand c JOIN n x ON c.id_a = x.id JOIN n y ON c.id_b = y.id
       |  WHERE round(list_reduce(
       |      list_transform(range(1,65), j -> x.vec[j] * y.vec[j]),
       |      (a,q) -> a+q) / (x.nrm * y.nrm), 6) >= 0.9),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT v.id AS vec_id,
       |  CAST(coalesce(l.cluster_id, v.id) AS BIGINT) AS cluster_id
       |FROM v LEFT JOIN lab l ON v.id = l.id ORDER BY vec_id""".stripMargin
  }
}
