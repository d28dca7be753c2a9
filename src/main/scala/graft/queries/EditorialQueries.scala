package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.editorial.Editorial
import org.apache.spark.sql.functions._

/** J4 under the correctness gate: construct the heterogeneous parser-event
  * list per document (every 9th row missing its parser-outputs block),
  * locate blocks by shape, and emit the extracted fields + error count.
  * The oracle states the EXPECTED extraction directly — the JSON
  * construction is deterministic, so any drift in flatten/discriminate/
  * extract logic breaks the hash.
  */
object EditorialQueries {

  val defs: Map[String, QueryDef] = Map(

    // ── P1–P8 + J1 under the gate: synthesize file-metadata rows from
    //    documents (v1.1/v1.2 domain variants by row), run the DRI
    //    metadata transform, and hash against the expected canonicalized
    //    output stated directly in SQL. ──
    "dri_sip_metadata" -> QueryDef(
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val isFolder = pmod(col("doc_id"), lit(10)) === 0
        val csv = docs.select(
          col("doc_id"),
          concat(lit("data/content/doc "), col("doc_id"),
            when(isFolder, lit("")).otherwise(lit(".txt"))).as("Filepath"),
          concat(lit("doc "), col("doc_id")).as("FileName"),
          when(isFolder, lit("Folder")).otherwise(lit("File")).as("FileType"),
          lit("1").as("Filesize"),
          lit("Crown Copyright").as("RightsCopyright"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("Public Record"))
            .otherwise(lit("Public Record(s)")).as("LegalStatus"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("TNA"))
            .otherwise(lit("The National Archives, Kew")).as("HeldBy"),
          lit("English").as("Language"),
          lit("").as("FoiExemptionCode"),
          when(isFolder, lit("")).otherwise(lit("2022-09-29T15:10:20")).as("LastModified"))
        val manifest = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(concat(lit("data/content/doc "), col("doc_id"), lit(".txt")).as("file"),
            sha2(col("text"), 256).as("checksum"))
        val bagInfo = Map(
          "Consignment-Series" -> "MOCKA 101",
          "Consignment-Export-Datetime" -> "2022-07-18T12:45:45Z",
          "Internal-Sender-Identifier" -> "TDR-2022-AA1")
        graft.ops.drisip.DriSip.metadataRows(csv, manifest, bagInfo, Some("doc_id"))
          .withColumn("n_errors", size(col("errors"))).drop("errors")
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  'file:/MOCKA101Y22TBAA1/MOCKA_101/content/doc%20' || doc_id
        |    || (CASE WHEN doc_id % 10 = 0 THEN '/' ELSE '.txt' END) AS identifier,
        |  'doc ' || doc_id AS file_name,
        |  CASE WHEN doc_id % 10 = 0 THEN 'folder' ELSE 'file' END AS folder,
        |  CASE WHEN doc_id % 10 = 0 THEN '2022-07-18T12:45:45'
        |       ELSE '2022-09-29T15:10:20' END AS date_last_modified,
        |  CASE WHEN doc_id % 10 = 0 THEN '' ELSE sha256(text) END AS checksum,
        |  'Crown Copyright' AS rights_copyright,
        |  'Public Record(s)' AS legal_status,
        |  'The National Archives, Kew' AS held_by,
        |  'English' AS language,
        |  'TDR-2022-AA1' AS TDR_consignment_ref,
        |  0 AS n_errors
        |FROM documents ORDER BY doc_id""".stripMargin),
    "j4_block_location" -> QueryDef(
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val ctx = concat(
          lit("""{"context":{"number-of-retries":"0","s3-bagit-name":"b","judgment-document":"doc_"""),
          col("doc_id"),
          lit(""".docx","consignment-type":"judgment","bag-info-txt":"b"},"parser-inputs":{"consignment-reference":"R-"""),
          col("doc_id"),
          lit("""","s3-bucket":"b","document-url":"u","attachment-urls":[],"s3-output-prefix":"parsed/"}}"""))
        val out = concat(
          lit("""[{"parser-outputs":{"xml":""""), col("doc_id"),
          lit(""".xml","metadata":"metadata.json","images":["i.png"],"attachments":[],"log":"parser.log","error-messages":[]}}]"""))
        val json = when(pmod(col("doc_id"), lit(9)) === 0,
          concat(lit("["), ctx, lit("]")))                    // missing parser-outputs
          .otherwise(concat(lit("["), ctx, lit(","), out, lit("]")))
        val located = Editorial.locateBlocks(
          docs.select(col("doc_id"), json.as("json")), "json")
        located.select(
          col("doc_id"),
          col("context.judgment-document").as("judgment_doc"),
          col("parser_inputs.consignment-reference").as("reference"),
          col("parser_outputs.xml").as("xml"),
          size(col("block_errors")).as("n_block_errors"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  'doc_' || doc_id || '.docx' AS judgment_doc,
        |  'R-' || doc_id AS reference,
        |  CASE WHEN doc_id % 9 = 0 THEN NULL ELSE doc_id || '.xml' END AS xml,
        |  CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END AS n_block_errors
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
