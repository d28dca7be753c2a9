package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class TrendingSpec extends SparkSpec {
  import spark.implicits._

  private val iv = 1000000000L // 1s intervals in ns

  private def drive(batches: Seq[Seq[(String, Long)]]): Map[Long, Seq[(String, Long, Long, String)]] = {
    val in = Files.createTempDirectory("trend_in")
    val outRows = scala.collection.mutable.Map[Long, Seq[(String, Long, Long, String)]]()
    val stream = spark.readStream.schema("k STRING, ts_ns LONG").json(in.toString)
    val counts = Trending.decayedCounts(stream, "k", "ts_ns",
      intervalNs = iv, spikeX100 = 300L)
    val q = counts.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        outRows(id) = b.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      }.start()
    batches.zipWithIndex.foreach { case (rows, i) =>
      Files.write(in.resolve(s"b$i.jsonl"),
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map { case (k, ts) => s"""{"k":"$k","ts_ns":$ts}""" }).asJava)
      q.processAllAvailable()
    }
    q.stop()
    outRows.toMap
  }

  test("counts decay by powers of two across intervals; bursts flag as spikes") {
    val out = drive(Seq(
      // batch 0: 4 events for key a in interval 0
      Seq(("a", 100L), ("a", 200L), ("a", 300L), ("a", 400L)),
      // batch 1: one event two intervals later: 4096 >> 2 = 1024, +1024
      Seq(("a", 2 * iv)),
      // batch 2: burst of 9 in the same interval → 2048+9216 > 3× 2048
      Seq.fill(9)(("a", 2 * iv + 500L))))
    assert(out(0) == Seq(("a", 0L, 4096L, "active")))
    assert(out(1) == Seq(("a", 2L, 2048L, "active")))
    assert(out(2) == Seq(("a", 2L, 11264L, "spike")))
  }

  test("within-batch event-time ordering is canonical (late rows fold first)") {
    // same events, shuffled inside one batch: fold sorts by interval, so
    // the result equals the ordered run: interval 0 count 2048 decayed
    // once (1024) then +1024 at interval 1 → 2048
    val shuffled = drive(Seq(Seq(("a", iv + 1L), ("a", 10L), ("a", 20L))))
    val ordered = drive(Seq(Seq(("a", 10L), ("a", 20L), ("a", iv + 1L))))
    assert(shuffled(0) == ordered(0) && shuffled(0) == Seq(("a", 1L, 2048L, "active")))
  }

  test("keys are independent; old-interval stragglers add without decay") {
    val out = drive(Seq(
      Seq(("a", 100L), ("b", 100L)),
      Seq(("a", 50L)))) // straggler at an already-seen interval
    assert(out(0).toSet == Set(("a", 0L, 1024L, "active"), ("b", 0L, 1024L, "active")))
    assert(out(1) == Seq(("a", 0L, 2048L, "active")))
  }
}
