package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries so the
  * pushdown / broadcast / whole-stage-codegen properties are reviewable:
  * `sbt "runMain graft.tools.PlanAudit [sfDir] [query ...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q6_forecast_revenue", "dedup_jaccard3", "emb_near_dup", "ev_hourly_agg")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (names == Seq("all")) {
      // one audit line per query: the plan-quality red flags at a glance.
      // BNLJ is only acceptable when one side is a scalar/tiny broadcast —
      // flagged here so every occurrence gets a deliberate reading.
      println(f"${"query"}%-28s cartesian bnlj globalWin exchanges")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          def c(m: String) = plan.sliding(m.length).count(_ == m)
          val gw = "Window operation!"
          println(f"$n%-28s ${c("CartesianProduct")}%9d ${c("BroadcastNestedLoopJoin")}%4d " +
            f"${c(gw)}%9d ${c("Exchange (")}%9d")
        } catch { case e: Throwable => println(f"$n%-28s ERROR ${e.getMessage.take(80)}") }
      }
    } else names.foreach { n =>
      println(s"\n=================== $n ===================")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
