package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (event-time lookup) join — the classic operator Spark lacks
  * natively: for every left row, attach the payload of the LATEST right
  * row with `right.ts <= left.ts` for the same key.
  *
  * Composed from built-ins per the preference order (SURVEY §2.10 /
  * build guidance (a)): tag-union both sides, one shuffle on the key, and
  * a running `last(payload, ignoreNulls)` window carries the most recent
  * right payload forward into left rows. Wall cost is one sort-shuffle —
  * the same as a sort-merge join — and no custom SparkPlan is needed.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate if not (ties
  * at identical timestamps are ambiguous in any as-of semantics).
  * At equal timestamps right sorts before left, so `<=` holds.
  */
object AsofJoin {

  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.select((Seq(col(key), col(ts)) ++ payloadCols.map(col)): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .drop("_side")
      .drop(payloadCols: _*)
  }
}
