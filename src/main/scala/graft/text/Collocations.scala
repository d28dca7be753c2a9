package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining: rank adjacent token pairs by pointwise mutual
  * information, PMI(a,b) = log( N·c(a,b) / (c(a)·c(b)) ), the standard
  * phrase/collocation signal (Church & Hanks 1990) used to build
  * tokenizer merge candidates and phrase vocabularies over a corpus.
  *
  * log is monotone, so the RANKING only needs the exact rational
  * N·c(a,b) / (c(a)·c(b)); the score column is that ratio in scaled
  * integer form, (N·c_ab·10⁶) DIV (c_a·c_b) — exact BIGINT arithmetic,
  * no libm anywhere (same engine-portability reasoning as LmScore's
  * whole-bit surprisal). Magnitudes: N·c_ab·10⁶ stays under 2⁶³ while
  * N·c_ab < 9·10¹², comfortably past billion-bigram corpora for any
  * collocation that isn't itself a duplication bug.
  *
  * Scale shape: two shuffled count aggregations (bigram grain, unigram
  * grain — both map-side combined), a broadcast-sized unigram join only
  * for the surviving ≥minCount bigrams, and a TakeOrdered top-k (per-
  * partition heads, no global sort materialization).
  */
object Collocations {

  /** Top-k collocations: (w1, w2, c_ab, c_a, c_b, pmi_score_x1m). */
  def topPmi(docs: DataFrame, textCol: String, minCount: Int, k: Int): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("t"))
      .localCheckpoint(eager = false)
    val bigrams = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val n = bigrams.agg(count(lit(1)).as("n_bigrams"))
    c12
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_score_x1m",
        expr("(n_bigrams * c_ab * 1000000) DIV (c_a * c_b)"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_score_x1m"))
      .orderBy(col("pmi_score_x1m").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
