package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents (in stable id order)
  * into fixed-capacity token bins, documents spanning bin boundaries —
  * the "concat and chunk" packing used to build LLM training batches
  * (every bin is exactly `capacity` tokens except each shard's last).
  *
  * Declarative formulation — no sequential pass, no driver loop:
  * a per-shard running token total places each document in the stream
  * (`start = cum - n_tok`), and the bins it overlaps are just
  * `start div C .. (cum-1) div C`, exploded with `sequence()`. One
  * shuffle on the shard key; shard count scales with the corpus (one
  * shard per output file at 100 TB), so per-shard window state stays
  * bounded and shards pack in parallel.
  *
  * Integer arithmetic only (`DIV`, `%`) — bin ids stay exact past
  * 2^53 tokens where double `floor(x / C)` would drift.
  */
object SequencePack {

  /** Segment rows (one per document × bin it overlaps):
    * (id, shard, bin, off_in_bin, off_in_doc, seg_len). A bin's payload
    * is its segments ordered by off_in_bin; a document's token stream is
    * its segments ordered by off_in_doc.
    *
    * @param nTok per-document token count column (must be > 0 rows only;
    *             zero-token docs are dropped — they occupy no stream
    *             positions)
    */
  def packSpans(docs: DataFrame, id: Column, nTok: Column,
                shards: Int, capacity: Int): DataFrame =
    packSpansBy(docs, id, nTok, pmod(id, lit(shards.toLong)), capacity)

  /** [[packSpans]] with a caller-supplied shard key — e.g. a k-means
    * cluster id for SEMANTIC packing (related docs share a sequence, the
    * long-context curation trick), or a language/domain column. Same
    * deterministic greedy span layout within each shard.
    */
  def packSpansBy(docs: DataFrame, id: Column, nTok: Column,
                  shard: Column, capacity: Int): DataFrame = {
    val base = docs.select(id.as("id"), nTok.cast("long").as("n_tok"),
        shard.cast("long").as("shard"))
      .filter(col("n_tok") > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
    base
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("strt", col("cum") - col("n_tok"))
      .withColumn("bin", explode(sequence(
        expr(s"strt DIV $capacity"), expr(s"(cum - 1) DIV $capacity"))))
      .withColumn("seg_start", greatest(col("bin") * capacity, col("strt")))
      .withColumn("seg_end", least((col("bin") + 1) * capacity, col("cum")))
      .select(
        col("id"), col("shard"), col("bin"),
        (col("seg_start") - col("bin") * capacity).as("off_in_bin"),
        (col("seg_start") - col("strt")).as("off_in_doc"),
        (col("seg_end") - col("seg_start")).as("seg_len"))
  }

  /** Per-bin roll-up: how full each packed sequence is and how many
    * document segments compose it (all bins except each shard's last
    * must be exactly `capacity` full).
    */
  def binStats(segments: DataFrame, capacity: Int): DataFrame =
    segments.groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("seg_len")).as("n_tokens"),
        countDistinct(col("id")).as("n_docs"))
      .withColumn("is_full", (col("n_tokens") === capacity).cast("int"))
}
