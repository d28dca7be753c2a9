package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def jsonStream(dir: java.nio.file.Path) =
    spark.readStream.schema("user_id LONG, ts_s LONG, id STRING")
      .json(dir.toString)
      .select($"user_id", timestamp_seconds($"ts_s").as("ts"), $"id")

  private def drive(views: Seq[(Long, Long, String)],
                    purchases: Seq[(Long, Long, String)],
                    horizonSec: Long): Set[(Long, String, String, Long)] = {
    val vDir = Files.createTempDirectory("attr_v")
    val pDir = Files.createTempDirectory("attr_p")
    def write(dir: java.nio.file.Path, rows: Seq[(Long, Long, String)]): Unit =
      Files.write(dir.resolve("b.jsonl"),
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.map { case (u, t, i) =>
          s"""{"user_id":$u,"ts_s":$t,"id":"$i"}""" }).asJava)
    write(vDir, views); write(pDir, purchases)
    val out = scala.collection.mutable.Set[(Long, String, String, Long)]()
    val joined = Attribution.touchJoin(jsonStream(vDir), jsonStream(pDir), horizonSec)
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r =>
          out += ((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
      }.start()
    q.processAllAvailable()
    q.stop()
    out.toSet
  }

  test("purchases match only views within the horizon, per user") {
    val got = drive(
      views = Seq((1L, 100L, "v1"), (1L, 500L, "v2"), (2L, 100L, "v3")),
      purchases = Seq((1L, 600L, "p1"), (2L, 5000L, "p2")),
      horizonSec = 300L)
    // p1 at t=600: v2 (gap 100) in horizon, v1 (gap 500) out; p2 too late for v3
    assert(got == Set((1L, "p1", "v2", 100L)))
  }

  test("horizon boundary is inclusive and cross-user touches never match") {
    val got = drive(
      views = Seq((1L, 100L, "v1"), (2L, 580L, "v9")),
      purchases = Seq((1L, 400L, "p1")),
      horizonSec = 300L)
    assert(got == Set((1L, "p1", "v1", 300L)))
  }

  test("a view can attribute to multiple purchases (multi-touch emission)") {
    val got = drive(
      views = Seq((1L, 100L, "v1")),
      purchases = Seq((1L, 150L, "p1"), (1L, 200L, "p2")),
      horizonSec = 300L)
    assert(got == Set((1L, "p1", "v1", 50L), (1L, "p2", "v1", 100L)))
  }
}
