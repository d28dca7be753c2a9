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
}
