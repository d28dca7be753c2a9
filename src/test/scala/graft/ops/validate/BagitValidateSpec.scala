package graft.ops.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BagitValidateSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    ("bag1", "data/doc.docx", "DOCX".getBytes),
    ("bag1", "bagit.txt", "BagIt".getBytes),
    ("bag2", "data/evil.bin", "EVIL".getBytes)
  ).toDF("bagId", "name", "content")

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes).map("%02x".format(_)).mkString

  test("verifyChecksums: ok / mismatch / missing / unexpected statuses (J3)") {
    val manifest = Seq(
      ("bag1", "data/doc.docx", sha("DOCX")),       // ok
      ("bag1", "bagit.txt", sha("WRONG")),          // mismatch
      ("bag1", "data/ghost.txt", sha("GHOST")),     // missing_file
      ("bag2", "data/evil.bin", sha("EVIL").toUpperCase) // ok (case-insensitive)
    ).toDF("bagId", "file", "checksum")
    val got = BagitValidate.verifyChecksums(files, manifest)
      .select($"file", $"status").as[(String, String)].collect().toMap
    assert(got("data/doc.docx") == "ok")
    assert(got("bagit.txt") == "checksum_mismatch")
    assert(got("data/ghost.txt") == "missing_file")
    assert(got("data/evil.bin") == "ok")
  }

  test("verifyChecksums flags files absent from the manifest") {
    val manifest = Seq(("bag1", "data/doc.docx", sha("DOCX"))).toDF("bagId", "file", "checksum")
    val got = BagitValidate.verifyChecksums(files, manifest)
    val extra = got.filter($"status" === "not_in_manifest")
      .select($"file").as[String].collect().toSet
    assert(extra == Set("bagit.txt", "data/evil.bin"))
  }

  test("reconcileCounts: 1 + |root| + |data| == |extracted| (A1)") {
    // bag1: root manifest lists 2 files (everything except itself),
    // data manifest lists 1; extracted = 4 files incl. both manifests.
    val root = Seq(("bag1", "bagit.txt"), ("bag1", "manifest-sha256.txt"))
      .toDF("bagId", "file")
    val data = Seq(("bag1", "data/doc.docx")).toDF("bagId", "file")
    val extracted = Seq(
      ("bag1", "bagit.txt"), ("bag1", "manifest-sha256.txt"),
      ("bag1", "tagmanifest-sha256.txt"), ("bag1", "data/doc.docx"))
      .toDF("bagId", "name")
    val r = BagitValidate.reconcileCounts(root, data, extracted).head()
    assert(r.getAs[Boolean]("counts_ok"))
    assert(r.getAs[Boolean]("data_counts_ok"))
  }

  test("setDifferences catches swapped extra+missing that count-equality misses (U1/U2)") {
    val listing = Seq(("b", "a.txt"), ("b", "b.txt")).toDF("bagId", "name")
    val extracted = Seq(("b", "a.txt"), ("b", "c.txt")).toDF("bagId", "name")
    val got = BagitValidate.setDifferences(listing, extracted)
      .select($"side", $"name").as[(String, String)].collect().toSet
    assert(got == Set(("only_listed", "b.txt"), ("only_extracted", "c.txt")))
  }

  test("singleEntryCheck: exactly one entry with matching basename (A4)") {
    val m = Seq(
      ("ok", "x", "TDR-2022-AA1.tar.gz"),
      ("two", "x", "TDR-2022-AA1.tar.gz"), ("two", "y", "TDR-2022-AA1.tar.gz"),
      ("wrongname", "x", "OTHER.tar.gz")
    ).toDF("bagId", "checksum", "basename")
    val got = BagitValidate.singleEntryCheck(m, "TDR-2022-AA1.tar.gz")
      .select($"bagId", size($"errors")).as[(String, Int)].collect().toMap
    assert(got("ok") == 0)
    assert(got("two") == 1)
    assert(got("wrongname") == 1)
  }
}
