package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 scoring and
  * inverted-index term lookup — the ranking half of a training-data
  * search/dedup stack (the ANN half lives in `graft.sim.Similarity`).
  *
  * Scale shape: BM25 is two passes over the corpus — a single global
  * aggregation producing one stats row (N, Σdl, per-term df) that rides
  * a broadcast, then a purely columnar scoring pass (no shuffle of the
  * corpus; the only shuffle is the final top-k). The inverted-index path
  * filters postings against the broadcast query-term list BEFORE the
  * aggregation, so only matching postings ever shuffle.
  *
  * Every arithmetic step is written with explicit parenthesization and
  * mirrored verbatim in the DuckDB oracle (queries.CorpusOpsQueries):
  * IEEE double ops are deterministic given the same operand order, and
  * the only transcendental (ln in the idf) takes a handful of distinct
  * small-rational inputs per corpus.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Occurrences of `term` in the token array. */
  def termFreq(toks: Column, term: String): Column =
    size(filter(toks, t => t === lit(term)))

  /** One-row corpus statistics: doc count, total token count, and one
    * document-frequency column `df_<i>` per query term.
    */
  def corpusStats(docs: DataFrame, toksCol: String, terms: Seq[String]): DataFrame = {
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col(toksCol), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(col(toksCol)).cast("long")).as("sum_dl") +: dfCols): _*)
  }

  /** BM25 score of `terms` against every document. `docs` must carry
    * `idCol` and a token-array column `toksCol` (project
    * `TextAnalysis.tokens` once upstream so tokenization runs once per
    * row). Returns (id, score) with the raw double score; callers round
    * for oracle-stable ranking.
    */
  def bm25(docs: DataFrame, idCol: String, toksCol: String,
           terms: Seq[String]): DataFrame = {
    val stats = corpusStats(docs, toksCol, terms)
    val dl = size(col(toksCol)).cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val df = col(s"df_$i").cast("double")
      val idf = log(((col("n_docs").cast("double") - df) + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      val tf = termFreq(col(toksCol), t).cast("double")
      idf * ((tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + (lit(B) * (dl / avgdl)))))
    }.reduce(_ + _)
    docs.join(broadcast(stats))
      .select(col(idCol), score.as("score"))
  }

  /** Per-document TF-IDF keyword extraction: the top-k terms of each
    * document by tf · idf, with idf as the EXACT integer surrogate
    * ⌊N·10⁶ / df⌋ − 10⁶ ∝ (N − df)/df — like log(N/df) it is strictly
    * decreasing in df and ZERO for ubiquitous terms (df = N), but
    * log-free (cross-engine ln drifts in the last ulp; see LmScore).
    * Ties break (score desc, term asc).
    *
    * Scale shape: tf is one map-combined count at the (doc, term) grain;
    * df one at the term grain; N is a 1-row broadcast. The final top-k
    * is a window ranked WITHIN each document — partitioned by doc_id, so
    * no global sort and no skew (each partition is one document's
    * vocabulary).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, toksCol: String,
                    k: Int): DataFrame = {
    // r14: tf is referenced by BOTH the df rollup and the scoring join —
    // materialize it once (exchange reuse does not cover the post-shuffle
    // aggregate work, and the upstream tokenize pass is the heavy leg)
    val tf = docs.select(col(idCol), explode(col(toksCol)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * expr("((n_docs * 1000000) DIV df) - 1000000")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists:
    * score(d) = Σ_lists ⌊10⁶ / (k + rank_list(d))⌋ — the standard way to
    * merge heterogeneous rankers (lexical BM25 + boolean match + vector
    * ANN) without calibrating their scores. Integer contributions, so
    * fusion is engine-exact. Each input carries (idCol, rankCol); lists
    * are LIMITed upstream, so the union is k·lists rows — driver-scale —
    * regardless of corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int, topK: Int): DataFrame =
    rankings
      .map(_.select(col(idCol),
        expr(s"CAST(1000000 AS BIGINT) DIV ($kRrf + $rankCol)").as("c")))
      .reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("rrf"), count(lit(1)).cast("int").as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)

  /** Inverted-index lookup: explode postings, keep only query terms
    * (broadcast join — non-matching postings never shuffle), then rank
    * documents by (distinct terms matched, total term frequency).
    * Integer-only scoring: no fp parity concerns.
    */
  def searchTopK(docs: DataFrame, idCol: String, toksCol: String,
                 terms: Seq[String], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = terms.toDF("term")
    docs.select(col(idCol), explode(col(toksCol)).as("term"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_sum"))
      .orderBy(col("n_terms").desc, col("tf_sum").desc, col(idCol))
      .limit(k)
  }
}
