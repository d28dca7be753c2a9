package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class WindowedCountsSpec extends SparkSpec {
  import spark.implicits._

  // 10 s tumbling windows, 5 s allowed lateness; epoch-second inputs
  private def harness() = {
    val dir = Files.createTempDirectory("wc_in")
    val out = scala.collection.mutable.Set[(Long, Long, String, Long)]()
    val stream = spark.readStream.schema("k STRING, ts_s LONG").json(dir.toString)
      .select($"k", timestamp_seconds($"ts_s").as("ts"))
    val q = EventStream.windowedCounts(stream, "ts", "k", "10 seconds", "5 seconds")
      .select(unix_timestamp($"w_start").as("s"), unix_timestamp($"w_end").as("e"),
        $"k", $"n")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r =>
          out += ((r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))))
      }.start()
    var n = 0
    val feed = (rows: Seq[(String, Long)]) => {
      Files.write(dir.resolve(s"b$n.jsonl"),
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map { case (k, t) => s"""{"k":"$k","ts_s":$t}""" }).asJava)
      n += 1
      q.processAllAvailable()
      out.toSet
    }
    (feed, q)
  }

  test("append mode emits a window exactly once, when the watermark closes it") {
    val (feed, q) = harness()
    // watermark after batch 0 = 12 - 5 = 7 < 10: nothing closed yet
    assert(feed(Seq(("a", 1L), ("a", 3L), ("b", 12L))) == Set.empty)
    // event at 27 → watermark 22: windows [0,10) and [10,20) both close
    assert(feed(Seq(("a", 27L))) ==
      Set((0L, 10L, "a", 2L), (10L, 20L, "b", 1L)))
    // late row at 5 (far behind watermark 22) is DROPPED — the closed
    // [0,10) count never changes; event at 41 closes [20,30)
    assert(feed(Seq(("a", 5L), ("c", 41L))) ==
      Set((0L, 10L, "a", 2L), (10L, 20L, "b", 1L), (20L, 30L, "a", 1L)))
    q.stop()
  }
}
