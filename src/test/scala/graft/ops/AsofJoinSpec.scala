package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join attaches the latest right payload with ts <= left ts") {
    val left = Seq(
      ("u1", 100L, "c1"), ("u1", 250L, "c2"), ("u1", 300L, "c3"),
      ("u2", 50L, "c4")).toDF("k", "t", "id")
    val right = Seq(
      ("u1", 100L, 10L),   // equal ts → visible (<=)
      ("u1", 200L, 20L),
      ("u1", 301L, 30L),   // after c3 → not visible
      ("u3", 1L, 99L)).toDF("k", "t", "v")
    val got = AsofJoin.join(left, right, "k", "t", Seq("v"))
      .select($"id", $"asof_v").as[(String, Option[Long])].collect().toMap
    assert(got == Map(
      "c1" -> Some(10L),   // equal-timestamp row counts
      "c2" -> Some(20L),
      "c3" -> Some(20L),   // 301 is in the future
      "c4" -> None))       // no prior right row for u2
  }

  test("as-of join plans one shuffle on the key (no per-row lookups)") {
    val left = Seq(("a", 1L, "x")).toDF("k", "t", "id")
    val right = Seq(("a", 1L, 1L)).toDF("k", "t", "v")
    val plan = AsofJoin.join(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("Join"))   // composed, not a join operator at all
  }
}
