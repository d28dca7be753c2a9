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
      """{"id": 4, "body": "ok", "extra": 9}""") // extra field tolerated
    Files.write(d.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, dlq) = Jsonl.readWithDlq(spark, d.toString, schema)
    val g = good.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(g == Seq((1L, "alpha"), (2L, "with \"quotes\" and \\slash"),
      (4L, "ok")))
    // DLQ keeps the exact input bytes — repairable, auditable
    assert(dlq.as[String].collect().sorted.toSeq ==
      Seq("""{"id": 3, "body": "tru""", "not json at all").sorted)
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
