package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-LM quality scoring (the CCNet / Gopher "perplexity bucket"
  * filter shape): train an add-one-smoothed bigram model ON the corpus
  * itself, then score every document by its average per-bigram surprisal.
  * High surprisal = tokens in improbable contexts = noisy document.
  *
  * Surprisal is measured in WHOLE BITS via exact integer bit lengths:
  *   bits(w1 w2) = bitlen(c(w1·) + V) − bitlen(c(w1 w2) + 1)
  *               ≈ ⌈−log2 P_add1(w2 | w1)⌉
  * where c(w1·) is the bigram-context count and V the unigram vocabulary
  * size. bitlen(n) = length of n's binary rendering — exactly computable
  * in any engine, so scores hash-match bit-for-bit where a float log
  * would drift in the last ulp between libm implementations.
  *
  * Scale shape: two shuffled aggregations build the model (bigram counts,
  * context counts), doc scoring joins doc-bigrams to the model on the
  * bigram key (shuffle join — model size tracks vocabulary², corpus size
  * only through counts), V rides a broadcast scalar. No driver loops.
  */
object LmScore {

  /** Exact ⌊log2 n⌋+1 for positive n. */
  def bitlen(n: Column): Column = length(bin(n))

  /** (doc_id, w1, w2) bigram rows for every doc with ≥ 2 tokens. */
  def docBigrams(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Per-document surprisal: (doc_id, n_bigrams, sum_bits, avg_bits_x100).
    * avg_bits_x100 = (sum_bits·100) DIV n_bigrams — integer division,
    * deterministic across engines.
    */
  def surprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val bg = docBigrams(docs, id, text).localCheckpoint(eager = false)
    val bigramCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val contextCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // bits depends only on the bigram TYPE, so resolve it at model grain
    // (vocab²-bounded) and join the corpus-grain bg rows ONCE: the
    // previous shape joined bg to the model twice (by (w1,w2), then again
    // by w1), paying two corpus-size shuffles where one suffices.
    val model = bigramCounts
      .join(contextCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        (bitlen(col("c1") + col("v")) - bitlen(col("c12") + 1)).cast("long")
          .as("bits"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .withColumn("avg_bits_x100", expr("(sum_bits * 100) DIV n_bigrams"))
  }
}
