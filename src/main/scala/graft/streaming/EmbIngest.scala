package graft.streaming

import graft.sim.IvfIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming embedding ingest that maintains a queryable persisted IVF
  * index: each micro-batch of (vec_id, embedding) rows is assigned
  * against the index's FROZEN centroid table and lands as an idempotent
  * per-batch posting subdir ([[IvfIndex.appendBatch]] — a replayed
  * batch after a checkpoint restart rewrites its own subdir, never
  * double-appends). The index stays queryable throughout:
  * [[IvfIndex.query]]/[[IvfIndex.stats]] read the store recursively.
  *
  * Contract: [[IvfIndex.build]] the index from the base corpus snapshot
  * FIRST (the stream never retrains centroids — centroid drift under
  * heavy growth shows up in [[IvfIndex.stats]]'s fattening right tail,
  * and the answer is a rebuild, as with [[CorpusIngest]]'s signature
  * store). Run [[IvfIndex.compact]] as offline maintenance between
  * stream runs — safe even when the last micro-batch was written but
  * not yet committed to the checkpoint: compaction preserves the
  * newest `b<N>` subdir as its own replay unit, so the restart's
  * replay overwrites exactly its own rows (see [[IvfIndex.compactDir]]).
  */
object EmbIngest {

  /** foreachBatch writer appending each micro-batch to `indexDir`.
    * After each append it records [[IvfIndex.health]] (one row) under
    * `indexDir/health/b<batchId>` — idempotent like the postings, so a
    * replayed batch rewrites its own health row — giving the operator
    * the per-batch `needs_rebuild` signal instead of a comment
    * (`trackHealth = false` opts out for latency-critical sinks).
    */
  def writer(emb: DataFrame, indexDir: String,
             idCol: String = "vec_id",
             vecCol: String = "embedding",
             trackHealth: Boolean = true): DataStreamWriter[Row] =
    emb.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        IvfIndex.appendBatch(batch.sparkSession, indexDir, batch.toDF(),
          id, idCol, vecCol)
        if (trackHealth)
          IvfIndex.health(batch.sparkSession, indexDir)
            .withColumn("batch_id", lit(id))
            .write.mode("overwrite").parquet(s"$indexDir/health/b$id")
        ()
      }
}
