package graft.ops.drisip

import graft.SparkSpec
import graft.core.io.TextTables
import org.apache.spark.sql.functions._

/** Table-driven port of the reference BDD features
  * (testing/features/bagit_transform_v_1_2.feature and _v_1_1.feature):
  * per-field expectations for file/folder rows under both CSV schema
  * versions, including nested folder paths.
  */
class BagitTransformFeatureSpec extends SparkSpec {

  val bagInfo = Map(
    "Consignment-Series" -> "MOCKA 101",
    "Internal-Sender-Identifier" -> "TDR-2022-AA1",
    "Consignment-Export-Datetime" -> "2022-07-18T12:45:45Z")

  val digest = "4ef13f1d2350fe1e9f79a88ec063031f65da834e8afdd0512e230544cca0a34b"
  val manifest = TextTables.parseManifest(
    { import spark.implicits._
      Seq(s"$digest  data/content/folder-a/file-a1.txt").toDF("line") })

  val fileRowV12 = Map(
    "Filepath" -> "data/content/folder-a/file-a1.txt", "FileName" -> "file-a1.txt",
    "FileType" -> "File", "Filesize" -> "36", "RightsCopyright" -> "Crown Copyright",
    "LegalStatus" -> "Public Record(s)", "HeldBy" -> "The National Archives, Kew",
    "Language" -> "English", "FoiExemptionCode" -> "",
    "LastModified" -> "2022-07-18T00:00:00", "OriginalFilePath" -> "")
  val folderRowV12 = fileRowV12 ++ Map(
    "Filepath" -> "data/content/folder-a", "FileName" -> "folder-a",
    "FileType" -> "Folder", "Filesize" -> "", "LastModified" -> "")
  val fileRowV11 = (fileRowV12 - "OriginalFilePath") ++ Map(
    "LegalStatus" -> "Public Record", "HeldBy" -> "TNA", "FoiExemptionCode" -> "open")
  val folderRowV11 = (folderRowV12 - "OriginalFilePath") ++ Map(
    "LegalStatus" -> "Public Record", "HeldBy" -> "TNA", "FoiExemptionCode" -> "open")

  private def csvDf(row: Map[String, String]) = {
    val cols = row.keys.toSeq.sorted
    val header = cols.mkString(",")
    val line = cols.map { c =>
      val v = row(c)
      if (v.contains(",")) "\"" + v + "\"" else v
    }.mkString(",")
    val p = java.nio.file.Files.createTempFile("fm", ".csv")
    java.nio.file.Files.write(p, java.util.Arrays.asList(header, line))
    TextTables.readHeaderCsv(spark, p.toString).na.fill("")
      .withColumn("_row", monotonically_increasing_id())
  }

  private def fieldsOf(df: org.apache.spark.sql.DataFrame,
                       fields: Seq[String]): Map[String, String] = {
    val r = df.select(fields.map(f => coalesce(col(f).cast("string"), lit("")).as(f)): _*).head()
    fields.map(f => f -> r.getAs[String](f)).toMap
  }

  val closureScenarios = Seq(
    ("v1.2 file closure", fileRowV12, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/file-a1.txt",
      "folder" -> "file", "closure_start_date" -> "", "closure_period" -> "0",
      "foi_exemption_code" -> "open", "foi_exemption_asserted" -> "",
      "title_public" -> "TRUE", "title_alternate" -> "",
      "closure_type" -> "open_on_transfer")),
    ("v1.2 folder closure", folderRowV12, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/",
      "folder" -> "folder", "closure_period" -> "0", "foi_exemption_code" -> "open",
      "closure_type" -> "open_on_transfer")),
    ("v1.1 file closure", fileRowV11, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/file-a1.txt",
      "folder" -> "file", "foi_exemption_code" -> "open")),
    ("v1.1 folder closure", folderRowV11, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/",
      "folder" -> "folder", "foi_exemption_code" -> "open")))

  closureScenarios.foreach { case (name, row, expected) =>
    test(s"feature: $name") {
      val out = DriSip.closureRows(csvDf(row), bagInfo, Some("_row"))
      assert(out.select(size(col("errors"))).head().getInt(0) == 0)
      val got = fieldsOf(out, expected.keys.toSeq)
      assert(got == expected)
    }
  }

  val metadataScenarios = Seq(
    ("v1.2 file metadata", fileRowV12, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/file-a1.txt",
      "file_name" -> "file-a1.txt", "folder" -> "file",
      "date_last_modified" -> "2022-07-18T00:00:00", "checksum" -> digest,
      "rights_copyright" -> "Crown Copyright", "legal_status" -> "Public Record(s)",
      "held_by" -> "The National Archives, Kew", "language" -> "English",
      "TDR_consignment_ref" -> "TDR-2022-AA1")),
    ("v1.2 folder metadata", folderRowV12, Map(
      "identifier" -> "file:/MOCKA101Y22TBAA1/MOCKA_101/content/folder-a/",
      "file_name" -> "folder-a", "folder" -> "folder",
      "date_last_modified" -> "2022-07-18T12:45:45", "checksum" -> "",
      "legal_status" -> "Public Record(s)",
      "held_by" -> "The National Archives, Kew")),
    ("v1.1 file metadata (TNA/Public Record canonicalized)", fileRowV11, Map(
      "checksum" -> digest, "legal_status" -> "Public Record(s)",
      "held_by" -> "The National Archives, Kew",
      "TDR_consignment_ref" -> "TDR-2022-AA1")))

  metadataScenarios.foreach { case (name, row, expected) =>
    test(s"feature: $name") {
      val out = DriSip.metadataRows(csvDf(row), manifest, bagInfo, Some("_row"))
      assert(out.select(size(col("errors"))).head().getInt(0) == 0)
      assert(fieldsOf(out, expected.keys.toSeq) == expected)
    }
  }
}
