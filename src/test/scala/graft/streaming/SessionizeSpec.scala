package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // gap 10 s, lateness 10 s; inputs are epoch seconds
  private def harness() = {
    val dir = Files.createTempDirectory("sess_in")
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val stream = spark.readStream.schema("user_id LONG, ts_s LONG").json(dir.toString)
      .select($"user_id", timestamp_seconds($"ts_s").as("ts"))
      .withWatermark("ts", "10 seconds")
    val q = Sessionize.sessions(stream, gapSec = 10L)
      .toDF("user_id", "start_ms", "end_ms", "n_events")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r =>
          out += ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      }.start()
    var n = 0
    val feed = (rows: Seq[(Long, Long)]) => {
      Files.write(dir.resolve(s"b$n.jsonl"),
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map { case (u, t) => s"""{"user_id":$u,"ts_s":$t}""" }).asJava)
      n += 1
      q.processAllAvailable()
      out.toSet
    }
    (feed, q)
  }

  test("sessions close by in-batch gap and by watermark timeout, emitting once") {
    val (feed, q) = harness()
    // all sessions open (every deadline ahead of the watermark 1002):
    // nothing may emit yet
    assert(feed(Seq((1L, 1000L), (1L, 1005L), (1L, 1008L), (2L, 1012L))) == Set.empty)
    // u1's event at 1030 is > gap past 1008: closes (1000-1008, n=3)
    // in-batch; the new (1030) session and u2 stay ahead of wm 1020
    val after1 = feed(Seq((1L, 1030L)))
    assert(after1 == Set((1L, 1000000L, 1008000L, 3L)))
    // u3 at 1100 pushes the watermark to 1090: u1's idle (1030) and
    // u2's idle (1012) sessions time out; u3's own stays open
    val after2 = feed(Seq((3L, 1100L)))
    assert(after2 == after1 +
      ((1L, 1030000L, 1030000L, 1L)) + ((2L, 1012000L, 1012000L, 1L)))
    assert(!after2.exists(_._1 == 3L), "open session must not emit")
    q.stop()
  }

  test("shuffled arrival within a batch folds in event-time order") {
    val (feed, q) = harness()
    // same session delivered out of order — still one session 1000..1008
    assert(feed(Seq((7L, 1008L), (7L, 1000L), (7L, 1005L))) == Set.empty)
    val fin = feed(Seq((9L, 2000L))) // watermark sweeps u7 out
    assert(fin == Set((7L, 1000000L, 1008000L, 3L)))
    q.stop()
  }
}
