package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical and hybrid ranking over the document corpus: BM25 scoring
  * against a fixed term set and reciprocal-rank fusion of independent
  * rankings — the retrieval half of a training-data curation pipeline
  * (query-based corpus audits, hybrid lexical+vector search over the
  * same tables the ANN operators index).
  *
  * Reference parity note: the reference (oxbow) has no text-retrieval
  * surface; these back the LLM-pipeline operator family. Determinism
  * is engineered the same way as the ANN/k-means operators: every
  * double expression is built from correctly-rounded IEEE ops in a
  * FIXED evaluation order, and every derived constant (k1+1, 1-b) is
  * computed once in driver Scala and shipped verbatim to both engines
  * (gate q68/q69 embed the identical `Double.toString` literals in the
  * DuckDB replay), so scores and tie-breaks reproduce bit-for-bit. */
object Ranking {

  /** Okapi BM25 score of every document against a fixed `terms` set.
    *
    * Shape at scale: tokenize → explode → ONE `groupBy(doc)` with a
    * conditional-sum column per term (no per-term joins, no pivot
    * shuffle). The corpus stats (N, Σdlen, per-term df) are ONE
    * single-row aggregate collected to the driver here, so idf and
    * avg-dlen ship as literals and the returned frame's plan contains
    * exactly one pass over the corpus — the per-doc score is a narrow
    * codegen'd expression over the tf columns; nothing in the plan
    * grows with corpus size except the one hash aggregation, and the
    * term list rides as literals. (The earlier broadcast-crossJoin
    * formulation re-ran the tokenize→explode→groupBy pass once more
    * under the stats aggregate on every action.) Calling this method
    * therefore runs one eager Spark job for the stats row — the same
    * driver-side-constant strategy the k-means/IVF operators use for
    * their centroid literals.
    *
    * Semantics: whitespace tokens (the corpus tokenizer used by every
    * text gate); docs with a null id or null text are excluded from
    * the corpus (they have no defined length, and including them in N
    * would shift every idf). idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    * — the Robertson-Sparck Jones form, always positive. Per-term
    * contributions are summed in the GIVEN term order (double addition
    * is not associative; a fixed order is what lets an external engine
    * reproduce the score bits).
    *
    * @return (doc_id, dlen, score) — one row per corpus document */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(terms.distinct.size == terms.size, "duplicate term")
    require(k1 >= 0 && b >= 0 && b <= 1, "k1 >= 0 and 0 <= b <= 1")
    val toks = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("dlen"), col("__ws"))
    val words = toks.select(col("doc_id"), col("dlen"),
      explode(col("__ws")).as("__w"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__w") === t, 1L).otherwise(0L)).as(s"__tf$i")
    }
    val tf = words.groupBy(col("doc_id"), col("dlen"))
      .agg(tfCols.head, tfCols.tail: _*)
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    // the ONE eager corpus pass: a single-row aggregate collected to
    // the driver so every downstream action pays exactly one tf pass
    val statsRow = tf.agg(
      count(lit(1)).as("__n"),
      (sum(col("dlen")).as("__sumlen") +: dfCols): _*).head()
    val nDocs = statsRow.getLong(0)
    if (nDocs == 0L) // empty corpus: empty frame, correct schema
      return tf.select(col("doc_id"), col("dlen"),
        lit(0.0).as("score"))
    // derived constants computed ONCE here; the q68 oracle embeds the
    // same Double.toString values, so both engines use identical bits.
    // idf/avgLen use the same java.lang.Math ops (in the same order)
    // the former in-plan expressions compiled to, so scores are
    // bit-identical to the broadcast formulation.
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val n = nDocs.toDouble
    val avgLen = statsRow.getLong(1).toDouble / n
    val score = terms.indices.foldLeft(lit(0.0): Column) { (acc, i) =>
      val tfd = col(s"__tf$i").cast("double")
      val dfd = statsRow.getLong(2 + i).toDouble
      val idf = math.log(1.0 + (n - dfd + 0.5) / (dfd + 0.5))
      acc + lit(idf) * (tfd * lit(k1p1)) /
        (tfd + lit(k1) * (lit(oneMinusB) +
          lit(b) * col("dlen").cast("double") / lit(avgLen)))
    }
    tf.select(col("doc_id"), col("dlen"), score.as("score"))
  }

  /** Reciprocal-rank fusion of two rankings (doc_id, rank):
    * `rrf = Σ 1/(kRrf + rank_i)` over the lists the document appears
    * in — the standard parameter-free hybrid-search combiner (lexical
    * BM25 + vector ANN). Absent-from-a-list contributes 0. One
    * full-outer equi-join of two already-small top-k lists: at
    * production scale the inputs are k rows per query, so the fusion
    * cost is O(k), independent of corpus size.
    *
    * @return (doc_id, rank_a, rank_b, rrf) with absent ranks as 0
    *         (never null — "0 = not in that list", so the output is
    *         join-friendly without null-semantics traps downstream) */
  def rrfFuse(a: DataFrame, b: DataFrame, kRrf: Int = 60): DataFrame = {
    require(kRrf > 0, "kRrf must be positive")
    val aa = a.select(col("doc_id"), col("rank").as("__ra"))
    val bb = b.select(col("doc_id"), col("rank").as("__rb"))
    aa.join(bb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("__ra"), lit(0)).cast("int").as("rank_a"),
        coalesce(col("__rb"), lit(0)).cast("int").as("rank_b"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("__ra")).cast("double"),
          lit(0.0)) +
         coalesce(lit(1.0) / (lit(kRrf) + col("__rb")).cast("double"),
           lit(0.0))).as("rrf"))
  }
}
