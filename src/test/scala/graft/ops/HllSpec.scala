package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within the m=256 error envelope of exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val est = Hll.estimate(ev, "event_type", "event_id")
    val exact = ev.groupBy($"event_type".as("grp"))
      .agg(countDistinct($"event_id").as("n"))
    val rows = est.join(exact, Seq("grp"))
      .select($"grp", $"est", $"zeros", $"n").as[(String, Long, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, e, zeros, n) =>
      // raw estimate (no linear-counting fold-in): apply the correction
      // here, spec-side, exactly as a caller would from the zeros column
      val corrected =
        if (e <= 2.5 * 256 && zeros > 0) 256.0 * math.log(256.0 / zeros) else e.toDouble
      val ratio = corrected / n
      // 1.04/√256 ≈ 6.5% std error; deterministic pin at a loose 3σ
      assert(ratio > 0.8 && ratio < 1.2, s"group $g: est=$e corrected=$corrected exact=$n")
    }
  }

  test("register table and estimate are partitioning-invariant") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = Hll.estimate(ev, "event_type", "event_id").orderBy($"grp").collect().toSeq
    val b = Hll.estimate(ev.repartition(13), "event_type", "event_id")
      .orderBy($"grp").collect().toSeq
    assert(a == b)
  }

  test("registers merge by max across corpus splits (mergeable sketch)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val left = ev.filter($"event_id" % 2 === 0)
    val right = ev.filter($"event_id" % 2 =!= 0)
    val merged = Hll.registers(left, "event_type", "event_id")
      .unionAll(Hll.registers(right, "event_type", "event_id"))
      .groupBy($"grp", $"idx").agg(max($"mreg").as("mreg"))
      .orderBy($"grp", $"idx").collect().toSeq
    val whole = Hll.registers(ev, "event_type", "event_id")
      .orderBy($"grp", $"idx").collect().toSeq
    assert(merged == whole)
  }

  test("sliding estimate equals the batch estimate over each trailing window") {
    // ticks 10,11,13 with overlapping value sets; width 3 → tick 13's
    // window is {11,13} (12 absent, 10 expired by RANGE semantics)
    val rows = Seq.tabulate(200)(i => (10L, s"a$i")) ++
      Seq.tabulate(150)(i => (11L, s"b$i")) ++
      Seq.tabulate(120)(i => (13L, s"a$i"))
    val df = rows.toDF("t", "v")
    val slid = Hll.slidingEstimate(df, "t", "v", width = 3)
      .select($"h", $"est").as[(Long, Long)].collect().toMap
    def batchEst(ticks: Set[Long]): Long =
      Hll.estimate(df.filter($"t".isin(ticks.toSeq: _*)).withColumn("g", lit(1)),
        "g", "v").select($"est").as[Long].head()
    assert(slid(10L) == batchEst(Set(10L)))
    assert(slid(11L) == batchEst(Set(10L, 11L)))
    assert(slid(13L) == batchEst(Set(11L, 13L)), "tick 10 must expire at 13")
  }
}
