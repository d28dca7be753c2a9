package graft.core.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TreEventsSpec extends SparkSpec {
  import spark.implicits._

  val okEvent =
    """{"version":"1.0.0","timestamp":1660000000000000000,
      |"UUIDs":[{"TDR-UUID":"9717f66c-9e1f-4b0d-8289-6a0b2a32a2a5"},
      |         {"TRE-UUID":"2d421b33-5cd2-45b1-a169-d0a6e743b9b4"}],
      |"producer":{"name":"TRE","process":"tre-vb","type":"judgment",
      |            "environment":"dev","event-name":"bagit-validated"},
      |"parameters":{"bagit-validated":{"reference":"TDR-2022-AA1",
      |  "s3-bucket":"b","validated-files":{"path":"p","root":["a"],"data":["d"]}}}}"""
      .stripMargin.replaceAll("\n", "")

  test("envelope decode: fields, ns timestamp as long, latest UUID (S9/P13)") {
    val df = TreEvents.decode(Seq(okEvent).toDF("json"), "json")
    val row = df.select(
      $"event.version", $"event.timestamp", $"event.producer.event-name",
      $"latest_uuid", size($"event_errors")).head()
    assert(row.getString(0) == "1.0.0")
    assert(row.getLong(1) == 1660000000000000000L)
    assert(row.getString(2) == "bagit-validated")
    assert(row.getString(3) == "2d421b33-5cd2-45b1-a169-d0a6e743b9b4")
    assert(row.getInt(4) == 0)
  }

  test("parameters payload stays JSON and re-parses per event type") {
    val df = TreEvents.decode(Seq(okEvent).toDF("json"), "json")
      .select(element_at($"event.parameters", "bagit-validated").as("p"))
      .select(get_json_object($"p", "$.validated-files.root[0]").as("r"),
        get_json_object($"p", "$.reference").as("ref"))
    val row = df.head()
    assert(row.getString(0) == "a")
    assert(row.getString(1) == "TDR-2022-AA1")
  }

  test("validation flags bad producer.type, bad UUID key/value, missing fields") {
    val bad =
      """{"version":"1.0.0","timestamp":1,"UUIDs":[{"TDR":"not-a-uuid"}],
        |"producer":{"name":"x","process":"p","type":"weird",
        |            "environment":"dev","event-name":"e"},
        |"parameters":{}}""".stripMargin.replaceAll("\n", "")
    val errs = TreEvents.decode(Seq(bad).toDF("json"), "json")
      .select(explode($"event_errors")).as[String].collect().toSet
    assert(errs.contains("UUIDs: key must match <name>-UUID"))
    assert(errs.contains("UUIDs: value must be a UUID"))
    assert(errs.contains("producer.type: must be judgment|standard|null"))
  }

  test("non-v4 UUIDs are schema-valid (schema.json:19 doesn't pin the version)") {
    // a v1-style UUID (version nibble 1, variant nibble 0) — reference-valid
    val ev = okEvent.replace("2d421b33-5cd2-45b1-a169-d0a6e743b9b4",
      "2d421b33-5cd2-15b1-0169-d0a6e743b9b4")
    val errs = TreEvents.decode(Seq(ev).toDF("json"), "json")
      .select(size($"event_errors")).head().getInt(0)
    assert(errs == 0)
  }

  test("createFrom appends a fresh UUID and inherits producer.type (message.py:133-164)") {
    val df = TreEvents.decode(Seq(okEvent).toDF("json"), "json")
      .withColumn("next", TreEvents.createFrom(
        $"event", "TRE", "tre-files", "dev", "bagit-files-validated",
        map(lit("bagit-files-validated"), lit("{}"))))
    val row = df.select(
      size($"next.UUIDs"), element_at(map_keys(element_at($"next.UUIDs", -1)), 1),
      $"next.producer.type", $"next.producer.event-name", $"next.version").head()
    assert(row.getInt(0) == 3)
    assert(row.getString(1) == "TRE-UUID")
    assert(row.getString(2) == "judgment")       // inherited
    assert(row.getString(3) == "bagit-files-validated")
    assert(row.getString(4) == TreEvents.Version)
    // appended value is a fresh UUIDv4
    val v = df.select(element_at(map_values(element_at($"next.UUIDs", -1)), 1))
      .as[String].head()
    assert(v.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }

  test("v1 flat message decode + validation (tdr_message generation)") {
    val ok = """{"consignment-reference":"TDR-2021-CF6L",
      |"s3-bagit-url":"https://x/t.tar.gz","s3-sha-url":"https://x/t.tar.gz.sha256",
      |"consignment-type":"judgment","number-of-retries":0}"""
      .stripMargin.replaceAll("\n", "")
    val bad = """{"consignment-reference":"TDR-2021-CF6L"}"""
    val df = Seq(ok, bad).toDF("json")
      .select(TreEvents.parseV1($"json").as("m"))
      .select($"m.consignment-reference", $"m.number-of-retries",
        size(TreEvents.v1ValidationErrors($"m")).as("n_errors"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "TDR-2021-CF6L")
    assert(rows(0).getInt(1) == 0)
    assert(rows(0).getInt(2) == 0)
    assert(rows(1).getInt(2) == 4)   // four missing fields
  }

  test("sqs double-decode unwraps Records[].body → SNS Message (S9)") {
    val sns = s"""{"Message":${ujsonQuote(okEvent)},"MessageAttributes":{}}"""
    val df = Seq(sns).toDF("body")
      .select(TreEvents.parseSqsRecord($"body").as("event"))
    assert(df.select($"event.producer.name").as[String].head() == "TRE")
  }

  private def ujsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
