package graft.core.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextTablesSpec extends SparkSpec {
  import spark.implicits._

  test("manifest fixed-width parse: 64-hex digest + path + basename (S1)") {
    val lines = Seq(
      "5bd8879fba139fed98c048261cb2a91d727ceafb27414cc54e21c26915e9e40f  data/content/file-c1.txt",
      "AAD8879FBA139FED98C048261CB2A91D727CEAFB27414CC54E21C26915E9E40F  TDR-2022-AA1.tar.gz").toDF("line")
    val got = TextTables.parseManifest(lines).collect()
    assert(got(0).getString(0) == "5bd8879fba139fed98c048261cb2a91d727ceafb27414cc54e21c26915e9e40f")
    assert(got(0).getString(1) == "data/content/file-c1.txt")
    assert(got(0).getString(2) == "file-c1.txt")
    // digest lower-cased; single-component path is its own basename
    assert(got(1).getString(0) == "aad8879fba139fed98c048261cb2a91d727ceafb27414cc54e21c26915e9e40f")
    assert(got(1).getString(2) == "TDR-2022-AA1.tar.gz")
  }

  test("key:value parse splits on left-most separator only (S2)") {
    val got = TextTables.parseKeyValue(Seq(
      "Consignment-Export-Datetime: 2022-07-18T12:45:45Z",
      "Contact-Email: a:b@c.d").toDF("line")).collect()
    assert(got(0).getString(0) == "Consignment-Export-Datetime")
    assert(got(0).getString(1) == "2022-07-18T12:45:45Z")
    assert(got(1).getString(0) == "Contact-Email")
    assert(got(1).getString(1) == "a:b@c.d")
  }

  test("file-source readers: readManifest / readKeyValue / keyValueMap") {
    val dir = java.nio.file.Files.createTempDirectory("tt")
    java.nio.file.Files.write(dir.resolve("manifest-sha256.txt"),
      ("a" * 64 + "  data/doc.docx").getBytes)
    java.nio.file.Files.write(dir.resolve("bag-info.txt"),
      "Consignment-Series: MOCKA 101\nContact-Email: a:b@c.d".getBytes)
    val m = TextTables.readManifest(spark, dir.resolve("manifest-sha256.txt").toString).head()
    assert(m.getString(0) == "a" * 64 && m.getString(1) == "data/doc.docx")
    val kv = TextTables.keyValueMap(spark, dir.resolve("bag-info.txt").toString)
    assert(kv == Map("Consignment-Series" -> "MOCKA 101", "Contact-Email" -> "a:b@c.d"))
  }

  test("manifest parse: short/malformed lines degrade like the reference slicing") {
    // line[0:64] on a short line = whole line; line[64:] = '' (checksum_lib.py:48-49)
    val got = TextTables.parseManifest(Seq("deadbeef  short").toDF("line")).head()
    assert(got.getString(0) == "deadbeef  short")
    assert(got.getString(1) == "")
    assert(got.getString(2) == "")
  }

  test("basename/dirname column helpers (P9)") {
    val df = Seq("a/b/c.txt", "c.txt").toDF("p")
      .select(TextTables.basename($"p"), TextTables.dirname($"p"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "c.txt" && rows(0).getString(1) == "a/b")
    assert(rows(1).getString(0) == "c.txt" && rows(1).getString(1) == "")
  }
}
