package graft.ops

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: fold one user's cents in order. */
  private def ref(cents: Seq[Long], threshold: Long = 5000L): (Long, Long, Long) = {
    var ewma = cents.head
    var anomalies = 0L
    cents.tail.foreach { x =>
      if (math.abs(x - ewma) > threshold) anomalies += 1
      ewma = Math.floorDiv(3L * ewma + x, 4L)
    }
    (cents.size.toLong, ewma, anomalies)
  }

  test("streaming fold matches the reference recurrence, order by (ts, tie)") {
    // rows deliberately shuffled: (ts, tie) order must be restored
    val rows = Seq(
      (1L, 30L, 1L, 100L), (1L, 10L, 1L, 0L), (1L, 20L, 1L, 20000L),
      (1L, 20L, 0L, 400L), // same ts, smaller event_id → earlier
      (2L, 5L, 9L, 7L)
    ).toDF("user_id", "ts_ns", "event_id", "cents")
    val got = Ewma.ewmaAnomaly(rows, "user_id", "ts_ns", "event_id", "cents")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val u1 = ref(Seq(0L, 400L, 20000L, 100L))
    assert(got == Seq((1L, u1._1, u1._2, u1._3), (2L, 1L, 7L, 0L)))
  }

  test("a planted 10⁵-event user folds with O(1) state — no array row") {
    // deterministic pseudo-values; one hot user plus small bystanders
    val hot = (0 until 100000).map(i =>
      (7L, i.toLong, i.toLong, ((i * 2654435761L) % 49000L)))
    val cold = Seq((1L, 0L, 0L, 100L), (2L, 0L, 0L, 30000L))
    val got = Ewma.ewmaAnomaly((hot ++ cold).toDF("user_id", "ts_ns", "event_id", "cents"),
      "user_id", "ts_ns", "event_id", "cents")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val h = ref(hot.map(_._4))
    assert(got == Seq((1L, 1L, 100L, 0L), (2L, 1L, 30000L, 0L),
      (7L, 100000L, h._2, h._3)))
    // the anomaly count is NOT capped at 2^20 — no packed accumulator on
    // the engine side (the oracle's packing is an oracle-scale device)
    assert(h._3 > 0L)
  }
}
