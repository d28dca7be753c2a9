package graft.ops

import graft.functions.misra_gries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters at support 1/(k+1), sketch-guided.
  *
  * The naive plan — groupBy(item).count over everything, then filter —
  * shuffles the FULL item cardinality (at 100 TB: billions of distinct
  * tokens) to answer a question about <= k of them. This op never does:
  *
  *  - pass 1: one [[graft.functions.MisraGriesAgg]] over the corpus.
  *    Map-side partials keep <= k counters per partition, so the exchange
  *    carries kilobytes regardless of input size, and the MG guarantee
  *    makes the surviving counters a SUPERSET of every item with true
  *    count > n/(k+1) — independent of partitioning and merge order.
  *  - pass 2: exact recount of ONLY the <= k candidates (broadcast join,
  *    map-combined count on <= k distinct keys), keep those with
  *    cnt·(k+1) > n. Estimates from pass 1 are discarded: they are
  *    order-dependent; the exact counts are not, so the final frame is
  *    deterministic under any cluster shape.
  *
  * Same sketch-guided-exact shape as the bloom pre-join: the sketch
  * narrows, the exact pass answers.
  */
object HeavyHitters {

  /** (item, cnt) for every item with count·(k+1) > n, by (cnt desc, item). */
  def heavyHitters(df: DataFrame, item: String, k: Int): DataFrame = {
    val sk = df.agg(misra_gries(col(item), k).as("cand"),
      count(lit(1)).as("n"))
    val cand = sk.select(explode(col("cand")).as("e"), col("n"))
      .select(col("e.item").as("c_item"), col("n"))
    df.select(col(item).as("it"))
      .join(broadcast(cand), col("it") === col("c_item"))
      .groupBy(col("it"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("it").as("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
