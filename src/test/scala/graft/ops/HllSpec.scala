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
}
