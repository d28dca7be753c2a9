package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join: points against intervals with NO equi-key.
  * The naive plan is a BroadcastNestedLoopJoin over the range predicate —
  * quadratic work and a broadcast of one whole side. Here every interval
  * explodes into the fixed-width buckets it overlaps and every point maps
  * to its single containing bucket, so the match becomes an EQUI-join on
  * the bucket id plus an exact range post-filter. A (point, interval)
  * pair can meet only in the point's one bucket — no duplicate results,
  * no dedup pass. Cost scales with interval-length/bucket-width × rows,
  * not |points|·|intervals|.
  */
object RangeJoin {

  /** Join `points` (timestamp column `ptCol`, long units) to `intervals`
    * ([startCol, endCol) half-open, same units): returns the matched
    * pairs with all columns from both sides. `bucketWidth` should be on
    * the order of the typical interval length.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    // renamed internals: both sides often share lineage (self-range-joins
    // trip DetectAmbiguousSelfJoin otherwise). Empty/inverted intervals
    // are dropped up front — Spark's sequence(a, b) runs DESCENDING when
    // b < a, which would fabricate bucket rows the post-filter then has
    // to discard.
    val p = points.withColumn("_pb", floor(col(ptCol) / bucketWidth))
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_ib",
        explode(sequence(
          floor(col(startCol) / bucketWidth),
          floor((col(endCol) - 1) / bucketWidth))))
    p.join(iv, p("_pb") === iv("_ib") &&
        p(ptCol) >= iv(startCol) && p(ptCol) < iv(endCol))
      .drop("_pb", "_ib")
  }

  /** Interval × interval overlap join ([start, end) half-open on both
    * sides, long units): both sides explode into the fixed-width buckets
    * they span, match on the bucket id + exact overlap predicate, and
    * each overlapping pair is counted EXACTLY ONCE by attributing it to
    * the first bucket the pair shares — `bucket = max(⌊lStart/w⌋,
    * ⌊rStart/w⌋)` — instead of a distinct pass over the duplicated
    * matches. Cost scales with span/bucketWidth × rows, never |L|·|R|.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("_lb",
        explode(sequence(
          floor(col(lStart) / bucketWidth),
          floor((col(lEnd) - 1) / bucketWidth))))
    val r = right.filter(col(rEnd) > col(rStart))
      .withColumn("_rb",
        explode(sequence(
          floor(col(rStart) / bucketWidth),
          floor((col(rEnd) - 1) / bucketWidth))))
    l.join(r, l("_lb") === r("_rb") &&
        l(lStart) < r(rEnd) && r(rStart) < l(lEnd) &&
        l("_lb") === greatest(
          floor(l(lStart) / bucketWidth), floor(r(rStart) / bucketWidth)))
      .drop("_lb", "_rb")
  }
}
