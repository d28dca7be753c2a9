package graft.core

import graft.SparkSpec
import graft.core.io.Jsonl
import java.nio.file.Files
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("body", StringType)))

  test("good lines parse, bad lines route verbatim to the DLQ") {
    val d = Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"id": 1, "body": "alpha"}""",
      """{"id": 2, "body": "with \"quotes\" and \\slash"}""",
      """{"id": 3, "body": "tru""",           // truncated mid-string
      """not json at all""",
      "",                                     // blank line — null struct, no corrupt col
      "   ",                                  // whitespace-only
      "null",                                 // literal JSON null — parses, null struct
      """{"id": 4, "body": "ok", "extra": 9}""") // extra field tolerated
    Files.write(d.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, dlq) = Jsonl.readWithDlq(spark, d.toString, schema)
    val g = good.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(g == Seq((1L, "alpha"), (2L, "with \"quotes\" and \\slash"),
      (4L, "ok")))
    // DLQ keeps the exact input bytes — repairable, auditable — and
    // blank / whitespace / literal-null lines route here too (they are
    // not well-formed JSON OBJECTS; emitting all-null rows would lose
    // the verbatim line)
    assert(dlq.as[String].collect().sorted.toSeq ==
      Seq("""{"id": 3, "body": "tru""", "not json at all", "", "   ",
        "null").sorted)
  }

  test("gzipped shards (.jsonl.gz) decompress transparently on the same path") {
    val d = Files.createTempDirectory("jsonlgz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(d.resolve("shard-0.jsonl.gz")))
    out.write("{\"id\": 7, \"body\": \"zipped\"}\nnot json".getBytes("UTF-8"))
    out.close()
    val (good, dlq) = Jsonl.readWithDlq(spark, d.toString, schema)
    assert(good.as[(Long, String)].collect().toSeq == Seq((7L, "zipped")))
    assert(dlq.as[String].collect().toSeq == Seq("not json"))
  }

  test("streaming ingest routes per micro-batch and resumes idempotently") {
    val root = Files.createTempDirectory("jsonls")
    val in = Files.createDirectory(root.resolve("in"))
    val good = root.resolve("good").toString
    val dlq = root.resolve("dlq").toString
    val ckpt = root.resolve("ckpt").toString
    Files.write(in.resolve("a.jsonl"),
      "{\"id\": 1, \"body\": \"x\"}\nbroken line".getBytes("UTF-8"))
    val q1 = Jsonl.streamWithDlq(spark, in.toString, schema, good, dlq, ckpt)
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint: the already-committed file must NOT
    // re-ingest; only the new file's lines land
    Files.write(in.resolve("b.jsonl"),
      "{\"id\": 2, \"body\": \"y\"}\n{\"id\": 3".getBytes("UTF-8"))
    val q2 = Jsonl.streamWithDlq(spark, in.toString, schema, good, dlq, ckpt)
    q2.processAllAvailable(); q2.stop()
    // batch_id surfaces as a discovered partition column (provenance);
    // values are exactly-once across the restart
    assert(spark.read.parquet(good).select("id", "body")
      .as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "x"), (2L, "y")))
    assert(spark.read.text(dlq).select("value").as[String].collect().sorted.toSeq
      == Seq("broken line", "{\"id\": 3"))
    assert(spark.read.parquet(good).columns.contains("batch_id"))
  }

  test("a replayed micro-batch overwrites its own output — no duplicates") {
    val root = Files.createTempDirectory("jsonlr")
    val in = Files.createDirectory(root.resolve("in"))
    val good = root.resolve("good").toString
    val dlq = root.resolve("dlq").toString
    Files.write(in.resolve("a.jsonl"),
      "{\"id\": 1, \"body\": \"x\"}\nbroken".getBytes("UTF-8"))
    // two runs with DIFFERENT checkpoints simulate a replay of batch 0
    // after its writes committed but before the checkpoint commit
    Seq("ckpt1", "ckpt2").foreach { ck =>
      val q = Jsonl.streamWithDlq(spark, in.toString, schema, good, dlq,
        root.resolve(ck).toString)
      q.processAllAvailable(); q.stop()
    }
    assert(spark.read.parquet(good).select("id").as[Long].collect().toSeq
      == Seq(1L))
    assert(spark.read.text(dlq).select("value").as[String].collect().toSeq
      == Seq("broken"))
  }

  test("both legs are scan-local: no exchange in either plan") {
    val d = Files.createTempDirectory("jsonl2")
    Files.write(d.resolve("a.jsonl"),
      """{"id": 1, "body": "x"}""".getBytes("UTF-8"))
    val (good, dlq) = Jsonl.readWithDlq(spark, d.toString, schema)
    assert(!good.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!dlq.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(good.count() == 1L && dlq.count() == 0L)
  }
}
