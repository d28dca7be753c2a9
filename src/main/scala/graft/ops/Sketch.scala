package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch: hash every value into
  * [0, 2³²), keep the k smallest DISTINCT hashes per group, estimate
  * distinct = (k-1) · 2³² / h_k (the classic order-statistics estimator).
  *
  * Versus HLL (`approx_count_distinct`): the same mergeable-bounded-state
  * shape, but built from md5 + the bounded-heap `topk_by` aggregate, so
  * it is (a) deterministic across runs/partitionings and (b) replayable
  * in SQL by any engine with md5 — the whole sketch sits under the DuckDB
  * hash gate, which no engine-native HLL can do. Map-side partial
  * aggregation keeps ≤k hashes per group per partition on the wire.
  */
object Sketch {

  /** 32-bit md5-prefix hash (exact in long AND double — SQL-mirrorable
    * without bigint-overflow differences).
    */
  def hash32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Per-group KMV estimate: returns (group, h_k, est_distinct) for groups
    * carrying ≥ k distinct values (the sketch regime; below k the exact
    * count is free anyway).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    val hashed = df.select(col(groupCol).as("grp"),
        hash32(col(valueCol)).as("h"))
      .distinct()
    // k smallest hashes = topk_by on the negated hash; rank k holds h_k
    hashed
      .groupBy(col("grp"))
      .agg(graft.functions.topk_by((-col("h")).cast("double"), col("h"), k).as("top"))
      .select(col("grp"), explode(col("top")).as("t"))
      .filter(col("t.rank") === k)
      .select(col("grp"), col("t.nid").as("h_k"),
        floor(lit((k - 1) * 4294967296.0) / col("t.nid")).cast("long").as("est_distinct"))
  }

  /** KMV set-operation estimates between two value sets (theta-sketch
    * shape): |A|, |B| and |A∪B| each from a k-min sketch — the union
    * sketch is literally KMV over the stacked values, the mergeability
    * that lets sketches built per-partition (or per-corpus) combine
    * without re-reading data — and |A∩B| by inclusion–exclusion,
    * clamped at 0. ONE row out; everything md5-deterministic and
    * SQL-replayable.
    *
    * Below-k sides degrade gracefully (ADVICE r4): a side with fewer
    * than k distinct values never reaches rank k, but its sketch then
    * holds EVERY distinct hash — size(sketch) is the exact count
    * (modulo 32-bit hash collisions), so the estimate switches to that
    * instead of going NULL. An empty side estimates 0.
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame = {
    val stacked = a.select(lit("a").as("tag"), col(valueCol).as("v"))
      .unionByName(b.select(lit("b").as("tag"), col(valueCol).as("v")))
    val withU = stacked.unionByName(
      stacked.select(lit("u").as("tag"), col("v")))
    val hashed = withU.select(col("tag").as("grp"), hash32(col("v")).as("h"))
      .distinct()
    // rank-k hash when the sketch is full (try_element_at: the filter is
    // empty below k, and ANSI element_at would throw)
    val hk = try_element_at(
      filter(col("top"), t => t.getField("rank") === lit(k)), lit(1))
      .getField("nid")
    val est = hashed.groupBy(col("grp"))
      .agg(graft.functions.topk_by((-col("h")).cast("double"), col("h"), k)
        .as("top"))
      .select(col("grp"),
        when(size(col("top")) >= k,
          floor(lit((k - 1) * 4294967296.0) / hk).cast("long"))
          .otherwise(size(col("top")).cast("long")).as("est_distinct"))
    est
      .agg(
        coalesce(max(when(col("grp") === "a", col("est_distinct"))), lit(0L)).as("est_a"),
        coalesce(max(when(col("grp") === "b", col("est_distinct"))), lit(0L)).as("est_b"),
        coalesce(max(when(col("grp") === "u", col("est_distinct"))), lit(0L)).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0L),
          col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** Deterministic KMV-sample quantiles: a bottom-k priority sample (the
    * k rows with the smallest md5-prefix hash of a UNIQUE row key) is a
    * uniform sample whose per-partition top-k partials merge exactly —
    * the same bounded-heap mergeability as [[kmvDistinct]], so a 100 TB
    * group ships ≤k (hash, value) pairs per partition and the estimate
    * is independent of partitioning. Quantile p% is then the sample's
    * order statistic at integer rank `(p·n + 99) div 100` (n = sample
    * size), so the whole sketch — sampling AND rank arithmetic — replays
    * bit-for-bit in any engine with md5, unlike GK/KLL whose state
    * depends on merge order.
    *
    * `rowKeyCol` must be unique per row (hash ties across different
    * values break deterministically toward the smaller value on both
    * sides). `valueCol` must be integral (exact in long and double).
    */
  def kmvQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                   rowKeyCol: org.apache.spark.sql.Column, k: Int,
                   percents: Seq[Int]): DataFrame = {
    val pr = hash32(rowKeyCol)
    val n = size(col("top"))
    val sample = array_sort(transform(col("top"), t => t.getField("nid")))
    val qCols = percents.map { p =>
      element_at(sample,
        greatest(lit(1), floor((lit(p) * n + lit(99)) / lit(100)).cast("int")))
        .as(s"p$p")
    }
    df.select(col(groupCol).as("grp"), col(valueCol).as("v"), pr.as("pr"))
      .groupBy(col("grp"))
      .agg(graft.functions.topk_by((-col("pr")).cast("double"), col("v"), k)
        .as("top"))
      .select(col("grp") +: n.cast("long").as("n_sample") +: qCols: _*)
  }

  /** Count-Min Sketch cell position for hash row `j`: md5-derived, so the
    * whole sketch is deterministic and SQL-replayable (same trick as
    * `hash32`).
    */
  private def cmsPos(key: org.apache.spark.sql.Column, j: Int,
                     width: Int): org.apache.spark.sql.Column =
    pmod(hash32(concat(lit(s"$j:"), key.cast("string"))), lit(width))

  /** Build the CMS cell table: `depth`·`width` cells regardless of input
    * size — one explode (×depth) and one shuffle on (j, p). Cells are
    * mergeable across corpora by adding counts.
    */
  def cmsCells(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val entries = (1 to depth).map(j =>
      struct(lit(j).as("j"), cmsPos(col(keyCol), j, width).as("p")))
    df.select(explode(array(entries: _*)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.p").as("p"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate counts for `keys` against a cell table: est(key) =
    * min over rows of the key's cell — overestimates only (collisions
    * add, never subtract). Absent cells (count 0 — the cell table only
    * materializes non-empty cells) participate as ZERO via the left
    * join, so a key with any empty cell correctly estimates 0 and every
    * queried key yields a row. The cell table is broadcast (d·w rows).
    */
  def cmsEstimate(keys: DataFrame, cells: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val entries = (1 to depth).map(j =>
      struct(lit(j).as("j"), cmsPos(col(keyCol), j, width).as("p")))
    keys.select(col(keyCol).as("key"), explode(array(entries: _*)).as("e"))
      .join(broadcast(cells),
        col("e.j") === col("j") && col("e.p") === col("p"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
