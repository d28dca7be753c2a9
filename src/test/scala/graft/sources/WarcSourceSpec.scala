package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.WarcDataSource"

  private def docsDf = Seq(
    ("crawl-a", 1L, "hello world"),
    ("crawl-a", 2L, "second record body"),
    ("crawl-b", 10L, "b-side payload ✓")
  ).toDF("source", "doc_id", "text")

  private def writtenDir(): Path = {
    val d = Files.createTempDirectory("warcsrc")
    Warc.write(docsDf, d.toString).collect()
    d
  }

  test("connector full read matches Warc.read (uri + payload + ids)") {
    val dir = writtenDir()
    val viaSource = spark.read.format(fmt).load(dir.toString)
      .select($"uri", $"record_id", $"date", $"payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    val viaScan = Warc.read(spark, s"$dir/*.warc.gz")
      .collect().map(r => (r.uri, r.record_id, r.date,
        new String(r.payload, "UTF-8"))).toSet
    assert(viaSource == viaScan)
    assert(viaSource.size == 3)
  }

  test("index-only scan never opens the archive (works after deleting .warc.gz)") {
    val dir = writtenDir()
    Files.delete(dir.resolve("crawl-a.warc.gz"))
    Files.delete(dir.resolve("crawl-b.warc.gz"))
    val got = spark.read.format(fmt).load(dir.toString)
      .select($"uri", $"payload_len", $"payload_sha256")
      .orderBy($"uri")
      .as[(String, Long, String)].collect()
    assert(got.length == 3)
    assert(got.head._1 == "https://corpus.invalid/crawl-a/1")
    assert(got.head._2 == "hello world".getBytes("UTF-8").length.toLong)
    // requesting payload with the archives gone must fail (fetch mode)
    intercept[Exception] {
      spark.read.format(fmt).load(dir.toString).select($"payload").collect()
    }
  }

  test("uri filter prunes whole files and fetches only selected members") {
    val dir = writtenDir()
    val got = spark.read.format(fmt).load(dir.toString)
      .filter($"uri".startsWith("https://corpus.invalid/crawl-b/"))
      .select($"uri", $"payload")
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
    assert(got.toSeq == Seq(
      "https://corpus.invalid/crawl-b/10" -> "b-side payload ✓"))
    // a prefix matching nothing prunes every file at plan time
    assert(spark.read.format(fmt).load(dir.toString)
      .filter($"uri".startsWith("https://nowhere/")).count() == 0L)
    // the filter reaches the scan (dropped from the residual)
    val plan = spark.read.format(fmt).load(dir.toString)
      .filter($"uri".startsWith("https://corpus.invalid/crawl-b/"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("StartsWith"))
  }

  test("full-scan fallback without sidecars still honors filters") {
    val dir = writtenDir()
    Files.delete(dir.resolve("crawl-a.warc.cdx"))
    Files.delete(dir.resolve("crawl-b.warc.cdx"))
    val got = spark.read.format(fmt).load(dir.toString)
      .filter($"payload_len" > 11L)
      .select($"uri", $"payload_len", $"payload_sha256")
      .orderBy($"uri").as[(String, Long, String)].collect()
    assert(got.map(_._1).toSeq == Seq(
      "https://corpus.invalid/crawl-a/2", "https://corpus.invalid/crawl-b/10"))
    // sha computed from the payload itself agrees with the writer's index
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("second record body".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.head._3 == sha)
  }

  test("connector registers under the short name 'warc'") {
    val dir = writtenDir()
    assert(spark.read.format("warc").load(dir.toString).count() == 3L)
  }

  test("column pruning reaches the scan description") {
    val dir = writtenDir()
    val plan = spark.read.format(fmt).load(dir.toString)
      .select($"uri").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: [uri]"))
  }
}
