package graft.streaming

import graft.text.TextAnalysis
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming corpus ingest with dedup-at-ingest: every micro-batch of
  * documents is MinHash-LSH-matched against the standing corpus before
  * being admitted, so duplicates never enter the training set.
  *
  * State design for corpus scale: the standing corpus's signatures live
  * in an EXTERNAL store (parquet, one subdir per batch), not in operator
  * state — a 100 TB corpus's signature table outlives any executor, must
  * survive restarts, and is orders of magnitude past what the streaming
  * state store hosts per key. Each batch writes its survivors to
  * `store/b<batchId>` with overwrite, so a retried batch is idempotent
  * (same batch id → same subdir → same contents).
  *
  * Match rule (first-occurrence-wins, same as Dedup.incrementalLsh): a
  * doc is a duplicate iff its estimated Jaccard (signature agreement
  * fraction) with ANY standing doc or smaller-id batch doc reaches the
  * threshold; `dup_of` reports the smallest matching id. Only
  * non-duplicates join the store.
  */
object CorpusIngest {

  /** Fixed signature length (shared with the batch MinHash operators). */
  val K = 12

  private val storeSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("n_sh", IntegerType)))

  /** (id, sig, n_sh) MinHash signatures of a document frame; empty-shingle
    * docs are dropped (nothing to match on).
    */
  def signatures(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), n)).as("shset"))
      .filter(size(col("shset")) > 0)
      .select(col("id"),
        graft.functions.oph_minhash_sig(col("shset"), K).as("sig"),
        size(col("shset")).as("n_sh"))

  /** Band keys from a signature (LSH bucketing; bands must divide K). */
  private def banded(sigs: DataFrame, bands: Int): DataFrame = {
    require(K % bands == 0, s"bands must divide $K")
    val r = K / bands
    sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|",
          transform(slice(col("sig"), b * r + lit(1), lit(r)),
            x => x.cast("string"))))))
        .as("key"))
  }

  /** Standing signature store (union of every batch's survivors).
    * `excludeBatch` skips that batch's own subdir: a RETRIED batch must
    * not match its previous partial write (it would flag every one of
    * its own survivors as a duplicate of itself).
    */
  def readStore(spark: SparkSession, storeDir: String,
                excludeBatch: Option[Long] = None): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val skip = excludeBatch.map(b => s"b$b")
    val parts =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).filter(_.isDirectory)
        .filterNot(s => skip.contains(s.getPath.getName))
        .map(_.getPath.toString)
    if (parts.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], storeSchema)
    } else spark.read.schema(storeSchema).parquet(parts.toIndexedSeq: _*)
  }

  /** Dedup one micro-batch against the store + itself, persist survivors'
    * signatures, and return per-doc decisions
    * (id, is_dup, dup_of — null when kept).
    */
  def dedupBatch(batch: DataFrame, storeDir: String, batchId: Long,
                 bands: Int, threshold: Double, n: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    val sigs = signatures(batch, n).localCheckpoint(eager = true)
    val bb = banded(sigs, bands)
    val sb = banded(readStore(spark, storeDir, excludeBatch = Some(batchId)), bands)
    // candidates share ≥1 band key; standing×batch plus batch×batch
    // (smaller id earlier). Estimated Jaccard = sig agreement fraction.
    val standingCand = sb.as("a").join(bb.as("b"), col("a.key") === col("b.key"))
      .select(col("a.id").as("i"), col("a.sig").as("sig_i"),
        col("b.id").as("j"), col("b.sig").as("sig_j"))
    val batchCand = bb.as("a").join(bb.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("a.sig").as("sig_i"),
        col("b.id").as("j"), col("b.sig").as("sig_j"))
    val dupOf = standingCand.unionByName(batchCand).distinct()
      .withColumn("est", expr(
        s"size(filter(zip_with(sig_i, sig_j, (x, y) -> x = y), z -> z)) / $K.0"))
      .filter(col("est") >= threshold)
      .groupBy(col("j").as("id")).agg(min(col("i")).as("dup_of"))
    val decisions = sigs.join(dupOf, Seq("id"), "left")
      .localCheckpoint(eager = true) // decide once: store write + return
    decisions.filter(col("dup_of").isNull)
      .select(col("id"), col("sig"), col("n_sh"))
      .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
    decisions.select(col("id"), col("dup_of").isNotNull.as("is_dup"),
      col("dup_of"))
  }

  /** foreachBatch writer: decisions land in `outDir/b<batchId>` (same
    * idempotent per-batch layout as the store).
    */
  def writer(docs: DataFrame, storeDir: String, outDir: String,
             bands: Int = 4, threshold: Double = 0.8): DataStreamWriter[Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        dedupBatch(batch.toDF(), storeDir, id, bands, threshold)
          .write.mode("overwrite").parquet(s"$outDir/b$id")
        ()
      }
}
