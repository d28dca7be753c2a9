package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class TrePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes).map("%02x".format(_)).mkString

  /** Two bags: one valid, one with a corrupted manifest digest. */
  private def makeBags(dir: java.nio.file.Path): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    def write(name: String, files: Seq[(String, String)]): Unit = {
      val out = new TarArchiveOutputStream(
        new GzipCompressorOutputStream(Files.newOutputStream(dir.resolve(name))))
      files.foreach { case (n, c) =>
        val b = c.getBytes; val e = new TarArchiveEntry(n)
        e.setSize(b.length.toLong); out.putArchiveEntry(e); out.write(b); out.closeArchiveEntry()
      }
      out.close()
    }
    val doc = "JUDGMENT ONE"
    write("TDR-2022-OK1.tar.gz", Seq(
      "./TDR-2022-OK1/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-2022-OK1/bag-info.txt" -> "Consignment-Series: S 1",
      "./TDR-2022-OK1/manifest-sha256.txt" -> (sha(doc) + "  data/doc.docx"),
      "./TDR-2022-OK1/data/doc.docx" -> doc))
    write("TDR-2022-BAD1.tar.gz", Seq(
      "./TDR-2022-BAD1/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-2022-BAD1/bag-info.txt" -> "Consignment-Series: S 1",
      "./TDR-2022-BAD1/manifest-sha256.txt" -> (("0" * 64) + "  data/doc.docx"),
      "./TDR-2022-BAD1/data/doc.docx" -> doc))
  }

  test("full main path: validate → parser input → parse → editorial bundle") {
    val dir = Files.createTempDirectory("bags2")
    val out = Files.createTempDirectory("sips")
    makeBags(dir)
    val r = TrePipeline.runFull(spark, dir.toString + "/*.tar.gz", out.toString)

    // only the valid bag advances past validation
    assert(r.parserInputs.count() == 1)
    val pi = r.parserInputs.select($"msg").as[String].head()
    assert(get_json(pi, "$['parser-inputs']['consignment-reference']") == "TDR-2022-OK1")
    assert(get_json(pi, "$.context['judgment-document']") == "doc.docx")

    val po = r.parserOutputs.select($"parser_outputs.xml").as[String].head()
    assert(po == "TDR-2022-OK1.xml")

    // bundle written: metadata.json + the judgment doc under <ref>/0/
    val b = r.bundles.collect().head
    assert(b.getAs[String]("bagId") == "TDR-2022-OK1")
    val names = b.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
      .map(_.getString(0)).sorted
    assert(names == Seq("TDR-2022-OK1/0/doc.docx", "TDR-2022-OK1/0/metadata.json"))
    // the packed archive is a readable tar.gz with the doc bytes intact
    val back = graft.core.archive.Tar
      .explodePath(spark, b.getAs[String]("path")).collect()
    assert(new String(back.find(_.name.endsWith("doc.docx")).get.bytes) == "JUDGMENT ONE")

    // K8: output message threads the archive + sha256-sidecar URLs
    val om = r.outputMessages.collect().head
    assert(om.getAs[String]("bagId") == "TDR-2022-OK1")
    val folderUrl = om.getAs[String]("s3_folder_url")
    val shaUrl = om.getAs[String]("s3_sha256_url")
    assert(folderUrl.endsWith("TDR-2022-OK1.tar.gz"))
    assert(shaUrl == folderUrl + ".sha256")
    val msg = om.getAs[String]("output_message")
    assert(get_json(msg, "$['editorial-output']['s3-folder-url']") == folderUrl)
    assert(get_json(msg, "$['tar-gz']['key']") == "TDR-2022-OK1.tar.gz")
    // the sidecar object exists and matches the recorded archive digest
    val shaPath = new org.apache.hadoop.fs.Path(b.getAs[String]("path") + ".sha256")
    val fs = shaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(shaPath))
    assert(om.getAs[String]("sha256").length == 64)
  }

  private def get_json(json: String, path: String): String =
    Seq(json).toDF("j").select(get_json_object($"j", path)).head().getString(0)

  test("bundle for a bag with k>1 data files: one metadata.json, judgment doc only") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    val dir = Files.createTempDirectory("bagsmulti")
    val out = Files.createTempDirectory("sipsmulti")
    val doc = "JUDGMENT"; val annex = "ANNEX"; val extra = "EXTRA"
    val o = new TarArchiveOutputStream(
      new GzipCompressorOutputStream(Files.newOutputStream(dir.resolve("TDR-2022-MULTI.tar.gz"))))
    Seq(
      "./TDR-2022-MULTI/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-2022-MULTI/bag-info.txt" -> "Consignment-Series: S 1",
      "./TDR-2022-MULTI/manifest-sha256.txt" ->
        (sha(doc) + "  data/a-judgment.docx\n" + sha(annex) + "  data/b-annex.pdf\n" +
          sha(extra) + "  data/c-extra.txt"),
      "./TDR-2022-MULTI/data/a-judgment.docx" -> doc,
      "./TDR-2022-MULTI/data/b-annex.pdf" -> annex,
      "./TDR-2022-MULTI/data/c-extra.txt" -> extra
    ).foreach { case (n, c) =>
      val b = c.getBytes; val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong); o.putArchiveEntry(e); o.write(b); o.closeArchiveEntry()
    }
    o.close()
    val r = TrePipeline.runFull(spark, dir.toString + "/*.tar.gz", out.toString)
    val b = r.bundles.collect().head
    val names = b.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
      .map(_.getString(0)).sorted
    // exactly ONE metadata.json + the judgment doc (first data file), no annexes
    assert(names == Seq("TDR-2022-MULTI/0/a-judgment.docx", "TDR-2022-MULTI/0/metadata.json"))
  }

  test("integrated pipeline: N bags in one job, per-bag verdicts + provenance events") {
    val dir = Files.createTempDirectory("bags")
    makeBags(dir)
    val r = TrePipeline.run(spark, dir.toString + "/*.tar.gz")

    assert(r.entries.count() == 8)

    val verdicts = r.verdicts.orderBy($"bagId").collect()
    val ok = verdicts.find(_.getString(0) == "TDR-2022-OK1").get
    val bad = verdicts.find(_.getString(0) == "TDR-2022-BAD1").get
    assert(ok.getAs[Boolean]("ok"))
    assert(!bad.getAs[Boolean]("ok"))
    assert(bad.getAs[scala.collection.Seq[String]]("errors")
      .exists(_.startsWith("checksum_mismatch")))

    // counts: 1 (manifest itself) + 2 root + 1 data = 4 extracted
    assert(ok.getAs[Long]("n_root") == 2L)
    assert(ok.getAs[Long]("n_data") == 1L)
    assert(ok.getAs[Long]("n_extracted") == 4L)

    // provenance: TDR-UUID chain extended with a fresh TRE-UUID
    val ev = r.events.orderBy($"bagId")
      .select($"event_name", size($"event.UUIDs"),
        element_at(map_keys(element_at($"event.UUIDs", -1)), 1))
      .as[(String, Int, String)].collect()
    assert(ev.toSeq.map(_._1).sorted ==
      Seq("bagit-validated", "bagit-validation-error"))
    assert(ev.forall(e => e._2 == 2 && e._3 == "TRE-UUID"))
  }
}
