package graft.core.io

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus ingest with a dead-letter channel — the standard shape
  * for web-scale dumps where some fraction of lines is always truncated
  * or malformed and a failed line must not poison the run (same
  * bad-rows-routed-not-thrown policy as the streaming DLQ in
  * graft.streaming.EventStream; reference analogue: the per-message
  * error channel of tre_vb_validate_bagit).
  *
  * Deliberately a TEXT scan + `from_json`, not `spark.read.json`: the
  * raw-file JSON scan disallows queries whose referenced columns are
  * only the internal corrupt-record column (the parser prunes the data
  * away), so a DLQ-only leg would throw at execution. Parsing per line
  * with `from_json` keeps the verbatim line alongside the parse result —
  * both legs ride one scan-local pass, no shuffle, and the DLQ keeps the
  * EXACT input bytes for repair/audit.
  */
object Jsonl {

  private val corruptCol = "_graft_corrupt"

  /** Route a `value: string` frame of raw JSONL lines into (good, dlq)
    * — the shared split of the batch and streaming ingest paths. Both
    * legs are narrow projections of the input (no exchange).
    */
  def split(lines: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol), s"$corruptCol is reserved")
    val withCorrupt = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    val parsed = lines
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
    val good = parsed.filter(col(s"j.$corruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f").as(f)).toIndexedSeq: _*)
    val dlq = parsed.filter(col(s"j.$corruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    (good, dlq)
  }

  /** (good, dlq): good = rows parsed to `schema` (a row is good only if
    * the line is well-formed JSON matching the field types); dlq =
    * (raw_line) verbatim.
    */
  def readWithDlq(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, DataFrame) =
    split(spark.read.text(path), schema)

  /** Streaming JSONL ingest with the same dead-letter routing: watch
    * `path` for new files, parse each micro-batch with [[split]], append
    * good rows to `goodDir` (parquet) and bad lines byte-verbatim to
    * `dlqDir` (text). One foreachBatch so both legs commit from the SAME
    * micro-batch read — a line is never counted good in one leg and bad
    * in the other across a restart. Per-batch work is one narrow pass
    * over the new files; no stream state, so a 100 TB backlog drains at
    * scan throughput.
    */
  def streamWithDlq(spark: SparkSession, path: String, schema: StructType,
                    goodDir: String, dlqDir: String,
                    checkpointDir: String): StreamingQuery =
    spark.readStream.text(path).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val (good, dlq) = split(batch.toDF(), schema)
        good.write.mode("append").parquet(goodDir)
        dlq.write.mode("append").text(dlqDir)
        ()
      }
      .start()
}
