package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join equals the naive range predicate, without a BNLJ") {
    val points = (0L until 500L).map(i => (i, i * 13L % 997L)).toDF("p_id", "p_ts")
    val intervals = (0L until 40L).map(i => (i, i * 25L, i * 25L + 60L))
      .toDF("iv_id", "i_start", "i_end")

    val bucketized = RangeJoin
      .pointInInterval(points, "p_ts", intervals, "i_start", "i_end", bucketWidth = 64L)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().toSet

    val naive = points.crossJoin(intervals)
      .filter($"p_ts" >= $"i_start" && $"p_ts" < $"i_end")
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().toSet

    assert(naive.nonEmpty)
    assert(bucketized == naive)

    // the whole point: the executed plan joins on bucket equality, not a
    // nested loop over the range predicate
    val plan = RangeJoin
      .pointInInterval(points, "p_ts", intervals, "i_start", "i_end", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once, no BNLJ") {
    val a = (0L until 60L).map(i => (i, i * 17L % 499L, i * 17L % 499L + 45L))
      .toDF("a_id", "a_start", "a_end")
    val b = (0L until 45L).map(i => (i, i * 23L % 503L, i * 23L % 503L + 70L))
      .toDF("b_id", "b_start", "b_end")
    val got = RangeJoin
      .intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end", 64L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    val naive = a.crossJoin(b)
      .filter($"a_start" < $"b_end" && $"b_start" < $"a_end")
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(naive.nonEmpty)
    // set-equal AND multiplicity-equal (first-shared-bucket attribution)
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    val plan = RangeJoin
      .intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervals spanning many buckets and points on boundaries match exactly once") {
    val points = Seq((1L, 100L), (2L, 163L), (3L, 99L), (4L, 164L)).toDF("p_id", "p_ts")
    // one long interval [100, 164) spanning several width-16 buckets
    val intervals = Seq((7L, 100L, 164L)).toDF("iv_id", "i_start", "i_end")
    val got = RangeJoin.pointInInterval(points, "p_ts", intervals,
        "i_start", "i_end", bucketWidth = 16L)
      .select($"p_id").as[Long].collect().sorted.toSeq
    // 100 inclusive, 163 inside, 99 below, 164 at the exclusive end
    assert(got == Seq(1L, 2L))
  }

  test("empty and inverted intervals yield no matches (no descending buckets)") {
    val points = Seq((1L, 50L)).toDF("p_id", "p_ts")
    val intervals = Seq(
      (1L, 50L, 50L),    // empty
      (2L, 90L, 10L))    // inverted
      .toDF("iv_id", "i_start", "i_end")
    val got = RangeJoin.pointInInterval(points, "p_ts", intervals,
      "i_start", "i_end", bucketWidth = 16L)
    assert(got.count() == 0)
  }
}
