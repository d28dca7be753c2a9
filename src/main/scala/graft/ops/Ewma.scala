package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer EWMA anomaly detection per key — the sequential recurrence
  *   ewma' = (3·ewma + x) DIV 4        (α = 1/4 as the exact rational)
  *   anomaly when |x − ewma| > threshold   (ewma BEFORE the update)
  * folded over each key's events in (ts, tie) order. Exact integers
  * throughout, so results are partitioning-invariant and SQL-replayable
  * (the oracle folds the same list with one packed-BIGINT accumulator).
  *
  * Scale shape: the recurrence is order-dependent, so a per-key fold is
  * unavoidable — but it is a STREAMING fold, not a collected list. One
  * hash exchange on the key plus a partition-local sort
  * (`repartition(key) + sortWithinPartitions`) lines each key's events
  * up contiguously, and `mapPartitions` walks them with O(1) state per
  * key run. A 100 TB bot-grade key (millions of events) costs its slice
  * of the sort spill like any other rows — it never materializes as one
  * multi-GB array row, which is what a `collect_list` fold would build.
  */
object Ewma {

  /** @param events  frame holding the key, order, tie-break, and value
    *                columns (all coercible to long)
    * @return (user_id, n_events, ewma_cents, n_anomalies) per key
    */
  def ewmaAnomaly(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, centsCol: String,
                  threshold: Long = 5000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col(userCol).cast("long").as("u"),
      col(tsCol).cast("long").as("t"),
      col(tieCol).cast("long").as("e"),
      col(centsCol).cast("long").as("c"))
      .as[(Long, Long, Long, Long)]
    typed
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"), col("e"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Long, Long, Long)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Long, Long) = {
            val first = buf.next()
            val u = first._1
            var ewma = first._4
            var n = 1L
            var anomalies = 0L
            while (buf.hasNext && buf.head._1 == u) {
              val x = buf.next()._4
              if (math.abs(x - ewma) > threshold) anomalies += 1
              // floorDiv matches DuckDB's `//`; identical to truncation
              // on the non-negative cents domain
              ewma = Math.floorDiv(3L * ewma + x, 4L)
              n += 1
            }
            (u, n, ewma, anomalies)
          }
        }
      }
      .toDF("user_id", "n_events", "ewma_cents", "n_anomalies")
  }
}
