package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout: interleave the bits of two
  * columns so rows close in BOTH dimensions land close on the curve —
  * the multi-column clustering step behind lakehouse OPTIMIZE ZORDER.
  * Range-partitioning the z-value then gives every output file a tight
  * bounding box in both dimensions at once, so min/max file statistics
  * prune scans on EITHER predicate column — single-column sorting only
  * prunes its leading column.
  *
  * Pure integer bit arithmetic (shifts + masks, codegen'd built-ins):
  * exact at any scale and replayable in any engine.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: x's bit i → z bit 2i, y's bit i → z bit 2i+1.
    */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster a frame for writing: z-value → range partition → sort
    * within partitions. Every output partition covers a contiguous z
    * range = a tight 2-D bounding box.
    */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int,
             numPartitions: Int): DataFrame =
    df.withColumn("z", zvalue(x, y, bits))
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
}
