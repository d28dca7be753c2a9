package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the audit
  * a continuously-ingested 100 TB corpus needs before a new cut ships to
  * training: has the feature distribution moved?
  *
  * Emits the classic pair of homogeneity statistics per fixed-width
  * bucket: PSI (population stability index, Laplace-smoothed so empty
  * buckets stay defined) and the two-sample chi-squared term. Convention:
  * PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Scale: one scan bucketizes (map-side), one tiny aggregate at the
  * bucket grain (nBuckets rows), totals ride a 1-row broadcast — the
  * corpus never shuffles on content. Determinism: counts are exact
  * integers, the divisions are correctly-rounded IEEE ops on exact
  * inputs, and both statistics round to 4 dp before comparison.
  */
object Drift {

  /** Shared bucketization: per-bucket (n_a, n_b) on the full fixed spine
    * [0, nBuckets) — empty buckets included — plus the 1-row totals.
    */
  private def bucketCounts(df: DataFrame, valueCol: Column, inA: Column,
                           width: Int, nBuckets: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val bucket = least(floor(valueCol / lit(width.toDouble)).cast("long"),
      lit(nBuckets - 1L)).cast("int")
    val counts = df
      .select(bucket.as("bucket"), inA.as("in_a"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
    val spine = spark.range(0, nBuckets).select(col("id").cast("int").as("bucket"))
    val full = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = full.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    (full, tot)
  }

  /** Per-bucket drift profile of `valueCol` between the `inA` and !`inA`
    * halves: (bucket, n_a, n_b, psi_term, chi2_term) for every bucket in
    * the fixed spine [0, nBuckets), plus a `bucket = -1` summary row with
    * the totals and the summed statistics.
    */
  def psiProfile(df: DataFrame, valueCol: Column, inA: Column,
                 width: Int, nBuckets: Int): DataFrame = {
    val (full, tot) = bucketCounts(df, valueCol, inA, width, nBuckets)
    // empty buckets must appear (their smoothed PSI term is not zero when
    // the other half has mass)
    val k = lit(nBuckets.toDouble)
    val pa = (col("n_a") + lit(1.0)) / (col("ta") + k)
    val pb = (col("n_b") + lit(1.0)) / (col("tb") + k)
    val rowTot = col("n_a") + col("n_b")
    val ea = rowTot * col("ta") / (col("ta") + col("tb"))
    val eb = rowTot * col("tb") / (col("ta") + col("tb"))
    val round4 = (c: Column) => floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    val terms = full.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round4((pa - pb) * log(pa / pb)).as("psi_term"),
        when(rowTot === 0, lit(0.0)).otherwise(
          round4((col("n_a") - ea) * (col("n_a") - ea) / ea +
            (col("n_b") - eb) * (col("n_b") - eb) / eb)).as("chi2_term"))
    val summary = terms.agg(
      sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"),
      round4(sum(col("psi_term"))).as("psi_term"),
      round4(sum(col("chi2_term"))).as("chi2_term"))
      .select(lit(-1).as("bucket"), col("n_a"), col("n_b"),
        col("psi_term"), col("chi2_term"))
    terms.unionByName(summary)
  }

  /** Bucket-resolution Kolmogorov–Smirnov profile: per bucket, the gap
    * |CDF_a − CDF_b| between the halves' cumulative shares, plus a
    * `bucket = -1` summary row whose `gap` is the KS D statistic
    * (max over buckets). Unlike PSI this needs no smoothing and no
    * logarithm — cumulative counts are exact integers and the shares are
    * single correctly-rounded divisions, so the statistic is bit-stable
    * on any engine.
    *
    * The cumulative sum runs over the nBuckets-row frame via a triangular
    * self-join (bucket' ≤ bucket) — tiny-side work that avoids a global
    * window, which at corpus scale would serialize on one task (the frame
    * here is constant-size, but the pattern stays audit-clean).
    */
  def ksProfile(df: DataFrame, valueCol: Column, inA: Column,
                width: Int, nBuckets: Int): DataFrame = {
    val (full, tot) = bucketCounts(df, valueCol, inA, width, nBuckets)
    // rename one side: two-sided ops over shared lineage trip
    // DetectAmbiguousSelfJoin otherwise
    val lhs = full.select(col("bucket").as("b"))
    val rhs = full.select(col("bucket").as("b2"), col("n_a").as("a2"),
      col("n_b").as("b2n"))
    val cum = lhs.join(rhs, col("b2") <= col("b"))
      .groupBy(col("b"))
      .agg(sum(col("a2")).as("cum_a"), sum(col("b2n")).as("cum_b"))
    val round4 = (c: Column) => floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    val gap = round4(abs(col("cum_a") / col("ta") - col("cum_b") / col("tb")))
    val perBucket = cum.crossJoin(broadcast(tot))
      .select(col("b").as("bucket"), col("cum_a"), col("cum_b"), gap.as("gap"))
    val summary = perBucket.agg(
      max(col("cum_a")).as("cum_a"), max(col("cum_b")).as("cum_b"),
      max(col("gap")).as("gap"))
      .select(lit(-1).as("bucket"), col("cum_a"), col("cum_b"), col("gap"))
    perBucket.unionByName(summary)
  }
}
