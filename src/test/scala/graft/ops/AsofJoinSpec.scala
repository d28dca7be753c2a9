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

  test("native as-of exec matches the composed semantics row-for-row") {
    val left = Seq(
      ("u1", 100L, "c1"), ("u1", 250L, "c2"), ("u1", 300L, "c3"),
      ("u2", 50L, "c4")).toDF("k", "t", "id")
    val right = Seq(
      ("u1", 100L, 10L), ("u1", 200L, 20L), ("u1", 301L, 30L),
      ("u3", 1L, 99L)).toDF("k", "t", "v")
    val got = AsofJoin.native(left, right, "k", "t", Seq("v"))
      .select($"id", $"asof_v").as[(String, Option[Long])].collect().toMap
    assert(got == Map(
      "c1" -> Some(10L), "c2" -> Some(20L), "c3" -> Some(20L), "c4" -> None))
  }

  test("native as-of exec survives shared-scan lineage and randomized data") {
    // both sides derived from ONE parent frame (the self-join trap), keys
    // deliberately skewed + keys that exist on only one side
    val n = 5000
    val base = spark.range(n).select(
      $"id",
      ($"id" % 37).as("k"),
      (($"id" * 7919) % 10000).as("t"),
      ($"id" * 3).as("v"))
    val left = base.filter($"id" % 3 =!= 0).select($"k", $"t", ($"id").as("lid"))
    val right = base.filter($"k" < 30)
      .groupBy($"k", $"t").agg(max($"v").as("v"))
    val composed = AsofJoin.join(left, right, "k", "t", Seq("v"))
      .select($"lid", $"asof_v".as("a"))
    val native = AsofJoin.native(left, right, "k", "t", Seq("v"))
      .select($"lid", $"asof_v".as("b"))
    val diff = composed.join(native, Seq("lid"), "full_outer")
      .filter(!($"a" <=> $"b")).count()
    assert(diff == 0L)
    assert(native.count() == left.count())
  }

  test("native as-of plans AsofJoin with one exchange per side") {
    val left = Seq(("a", 1L, "x"), ("b", 2L, "y")).toDF("k", "t", "id")
    val right = Seq(("a", 1L, 1L), ("b", 1L, 2L)).toDF("k", "t", "v")
    val df = AsofJoin.native(left, right, "k", "t", Seq("v"))
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
