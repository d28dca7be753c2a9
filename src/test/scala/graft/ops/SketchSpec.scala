package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands near the exact distinct count (deterministic)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sk = Sketch.kmvDistinct(ev, "event_type", "user_id", 8)
    val exact = ev.groupBy($"event_type".as("grp"))
      .agg(countDistinct($"user_id").as("n"))
    val rows = sk.join(exact, Seq("grp"))
      .select($"grp", $"est_distinct", $"n")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, est, n) =>
      val ratio = est.toDouble / n
      // k=8 order-statistics estimator: loose but sane bounds; the value
      // is deterministic (md5), so this is a pin, not a flaky sample
      assert(ratio > 0.2 && ratio < 5.0, s"group $g: est=$est exact=$n")
    }
  }

  test("sketch result is partitioning-invariant (mergeable bounded state)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = Sketch.kmvDistinct(ev, "event_type", "user_id", 8)
      .orderBy($"grp").collect().toSeq
    val b = Sketch.kmvDistinct(ev.repartition(13), "event_type", "user_id", 8)
      .orderBy($"grp").collect().toSeq
    assert(a == b)
  }
}
