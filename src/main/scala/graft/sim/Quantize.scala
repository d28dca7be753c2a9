package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of the embedding column — the standard
  * memory/bandwidth lever for vector search at scale (4× smaller than
  * float32, integer dot products).
  *
  * Codes are exact integers in [-128, 127] derived from per-dimension
  * corpus min/max, so ranking by quantized dot product is EXACT integer
  * arithmetic (|dot| ≤ 128²·dims « 2^53) with no float drift anywhere —
  * a SQL oracle replays it bit-for-bit. The only doubles involved are the
  * deterministic IEEE ops inside the quantization formula itself.
  *
  * Scale: the per-dim stats are one explode + one tiny aggregate whose
  * k·dims result broadcasts; encoding is a map-side transform; the top-k
  * rescore shuffles ≤k rows per query per partition via the bounded-heap
  * aggregate.
  */
object Quantize {

  /** Per-dim (min, max) over the corpus as two broadcastable arrays. */
  private def dimStats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)))
      .groupBy(col("pos"))
      .agg(min(col("col").cast("double")).as("mn"),
        max(col("col").cast("double")).as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          x => x.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          x => x.getField("mx")).as("mxs"))

  /** (id, q) where q = int8 code array: floor((x-mn)/(mx-mn)·255 + 0.5) - 128,
    * constant dims collapse to code 0.
    */
  def int8Codes(emb: DataFrame, dims: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val code: Column = transform(sequence(lit(1), lit(dims)), d => {
      val x = element_at(col(vecCol), d).cast("double")
      val mn = element_at(col("mns"), d)
      val mx = element_at(col("mxs"), d)
      when(mx === mn, lit(0L)).otherwise(
        floor((x - mn) / (mx - mn) * lit(255.0) + lit(0.5)).cast("long") - 128L)
    })
    emb.crossJoin(broadcast(dimStats(emb, vecCol)))
      .select(col(idCol).as("id"), code.as("q"))
  }

  /** Exact top-k under the quantized integer dot product for every
    * `queryMod`-th vector. Ties break on neighbour id.
    */
  def int8TopK(emb: DataFrame, dims: Int, k: Int, queryMod: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // codes are reused by the query and corpus sides of the scoring join
    val codes = int8Codes(emb, dims, idCol, vecCol)
      .select(col("id"), col("q").cast("array<double>").as("q"))
      .localCheckpoint(eager = false)
    val queries = codes.filter(pmod(col("id"), lit(queryMod)) === 0)
      .select(col("id").as("qid"), col("q").as("qq"))
    val corpus = codes.select(col("id").as("nid"), col("q").as("nq"))
    queries.join(corpus, col("qid") =!= col("nid"))
      .withColumn("dot_q", graft.functions.dot_product(col("qq"), col("nq")))
      .groupBy(col("qid"))
      .agg(graft.functions.topk_by(col("dot_q"), col("nid"), k).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.nid").as("nid"),
        col("t.sim").cast("long").as("dot_q"), col("t.rank").as("rank"))
  }
}
