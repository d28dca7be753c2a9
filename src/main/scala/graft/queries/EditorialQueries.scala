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
