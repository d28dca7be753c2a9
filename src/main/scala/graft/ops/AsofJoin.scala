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

  /** Whole-operator variant (SURVEY §2.10 preference (c)): plans
    * `graft.plans.AsofJoinExec` — one hash exchange per side on its own
    * key, a single forward merge pass per co-partition, no union padding
    * or window state. Same semantics and output columns as `join`.
    *
    * The right side is re-aliased through a fresh Project so self-join
    * lineage (left and right derived from the same scan) can't collide
    * on expression ids.
    */
  def native(left: DataFrame, right: DataFrame, key: String, ts: String,
             payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge
    val spark = left.sparkSession
    graftbridge.addStrategy(spark, graft.plans.AsofJoinStrategy)
    val lPlan = graftbridge.analyzed(left)
    val rPlan0 = graftbridge.analyzed(right)
    val rCols = (Seq(key, ts) ++ payloadCols).distinct
    val rPlan = Project(rCols.map { n =>
      val a = rPlan0.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"right side has no column '$n'"))
      Alias(a, n)()
    }, rPlan0)
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left side has no column '$n'"))
    def rAttr(n: String) = rPlan.output.find(_.name == n).get.toAttribute
    val node = graft.plans.AsofJoinNode(
      lPlan, rPlan,
      lAttr(key), rAttr(key), lAttr(ts), rAttr(ts),
      payloadCols.map(rAttr), payloadCols.map("asof_" + _))
    graftbridge.ofRows(spark, node)
  }

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
