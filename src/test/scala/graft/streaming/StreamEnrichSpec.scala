package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrichment joins the dimension per batch, stateless") {
    val in = Files.createTempDirectory("enrich_in")
    val dimDir = Files.createTempDirectory("enrich_dim")
    Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir.toString)

    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val stream = spark.readStream.schema("event_id LONG, user_id LONG")
      .json(in.toString)
    // dimension read lazily per batch from the live parquet dir
    val dim = spark.read.parquet(dimDir.toString)
    val enriched = EventStream.enrich(stream, dim, Seq("user_id"))
    val q = enriched.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        out ++= b.select("event_id", "user_id", "tier").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.getString(2)).getOrElse("<null>")))
        ()
      }.start()

    Files.write(in.resolve("b0.jsonl"),
      scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        """{"event_id":10,"user_id":1}""",
        """{"event_id":11,"user_id":2}""",
        """{"event_id":12,"user_id":99}""")).asJava)
    q.processAllAvailable()
    q.stop()

    assert(out.toSet == Set(
      (10L, 1L, "gold"), (11L, 2L, "basic"), (12L, 99L, "<null>")))
  }

  test("per-batch dimension re-read inside foreachBatch sees live updates") {
    // A file-backed static DataFrame pins its file listing at creation —
    // overwriting it mid-stream FAILS the query rather than refreshing.
    // The live-dimension pattern is therefore: re-read the dimension
    // inside foreachBatch and enrich the BATCH frame (same join).
    val in = Files.createTempDirectory("enrich_in2")
    val dimDir = Files.createTempDirectory("enrich_dim2")
    Seq((1L, "gold")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir.toString)

    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, String)]]()
    val stream = spark.readStream.schema("event_id LONG, user_id LONG")
      .json(in.toString)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val dim = b.sparkSession.read.parquet(dimDir.toString)
        perBatch(id) = EventStream.enrich(b.toDF(), dim, Seq("user_id"))
          .select("user_id", "tier").collect()
          .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("<null>")))
          .toSet
        ()
      }.start()

    Files.write(in.resolve("b0.jsonl"),
      scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq("""{"event_id":1,"user_id":1}""")).asJava)
    q.processAllAvailable()
    // dimension update lands between batches
    Seq((1L, "platinum")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir.toString)
    Files.write(in.resolve("b1.jsonl"),
      scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq("""{"event_id":2,"user_id":1}""")).asJava)
    q.processAllAvailable()
    q.stop()

    val all = perBatch.values.flatten.toSet
    assert(all.contains((1L, "gold")))
    assert(all.contains((1L, "platinum")),
      s"expected the updated tier to appear; got $perBatch")
  }
}
