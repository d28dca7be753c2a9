package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical halves drift nothing: every PSI/chi2 term is zero") {
    // same distribution in both halves: values 0..49 in each
    val df = (0 until 50).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "in_a")
    val p = Drift.psiProfile(df, $"v", $"in_a", width = 10, nBuckets = 5)
      .orderBy($"bucket").as[(Int, Long, Long, Double, Double)].collect()
    assert(p.length == 6) // 5 buckets + summary
    assert(p.forall(r => r._4 == 0.0 && r._5 == 0.0), p.toSeq.toString)
    assert(p.head._1 == -1 && p.head._2 == 50L && p.head._3 == 50L)
  }

  test("a shifted half pushes the summary PSI past the 0.25 'shifted' bar") {
    // half A concentrated low, half B concentrated high
    val df = ((0 until 100).map(i => (i % 20, true)) ++
      (0 until 100).map(i => (30 + i % 20, false))).toDF("v", "in_a")
    val p = Drift.psiProfile(df, $"v", $"in_a", width = 10, nBuckets = 5)
      .orderBy($"bucket").as[(Int, Long, Long, Double, Double)].collect()
    val summary = p.head
    assert(summary._1 == -1 && summary._4 > 0.25,
      s"disjoint distributions must read as shifted, got $summary")
    assert(summary._5 > 0.0)
  }

  test("KS gap is zero on identical halves and 1.0 on disjoint ones") {
    val same = (0 until 50).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "in_a")
    val p1 = Drift.ksProfile(same, $"v", $"in_a", width = 10, nBuckets = 5)
      .orderBy($"bucket").as[(Int, Long, Long, Double)].collect()
    assert(p1.forall(_._4 == 0.0), p1.toSeq.toString)
    // A entirely in buckets 0-1, B entirely in buckets 3-4 → at bucket 2
    // the CDFs are 1 and 0: D = 1.0
    val shifted = ((0 until 100).map(i => (i % 20, true)) ++
      (0 until 100).map(i => (30 + i % 20, false))).toDF("v", "in_a")
    val p2 = Drift.ksProfile(shifted, $"v", $"in_a", width = 10, nBuckets = 5)
      .orderBy($"bucket").as[(Int, Long, Long, Double)].collect()
    assert(p2.head._1 == -1 && p2.head._4 == 1.0, p2.toSeq.toString)
    // cumulatives in the summary are the totals
    assert(p2.head._2 == 100L && p2.head._3 == 100L)
  }

  test("empty buckets stay on the spine with smoothed (non-NaN) terms") {
    val df = Seq((0, true), (0, false)).toDF("v", "in_a")
    val p = Drift.psiProfile(df, $"v", $"in_a", width = 10, nBuckets = 3)
      .orderBy($"bucket").as[(Int, Long, Long, Double, Double)].collect()
    assert(p.map(_._1).toSeq == Seq(-1, 0, 1, 2))
    assert(p.forall(r => !r._4.isNaN && !r._5.isNaN))
    // empty bucket, balanced totals: smoothing gives pa = pb → psi 0
    assert(p(2)._4 == 0.0 && p(2)._5 == 0.0)
  }
}
