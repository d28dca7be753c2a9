package graft.streaming

import graft.SparkSpec
import graft.sim.PqIndex
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming ingest into the persisted IVF-PQ (memory-scale) store:
  * streamed batches equal a one-shot append against the same frozen
  * coarse table + codebooks, batch replay is idempotent, and in-sink
  * compaction folds committed batches without touching the replay
  * boundary.
  */
class PqIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_pqingest_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  private def landParquet(df: org.apache.spark.sql.DataFrame,
                          watchDir: String, tag: String): Unit = {
    val tmp = s"$watchDir-stage/$tag"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    Files.createDirectories(Paths.get(watchDir))
    listDir(tmp)
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p,
        Paths.get(watchDir, s"${tag}_${p.getFileName.toString}")))
  }

  private def runStream(idx: String, tag: String, compactEvery: Int,
                        batches: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    val watch = scratch(s"${tag}_in")
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(watch)
    val q = PqIngest.writer(stream, idx, dims = 64, m = 16,
        compactEvery = compactEvery)
      .option("checkpointLocation", scratch(s"${tag}_ckpt")).start()
    batches.zipWithIndex.foreach { case (df, i) =>
      landParquet(df.select($"vec_id", $"embedding"), watch, s"x$i")
      q.processAllAvailable()
    }
    q.stop()
  }

  private def answer(idx: String, e: org.apache.spark.sql.DataFrame) =
    PqIndex.query(spark, idx, e.filter($"vec_id" % 50 === 0),
        nprobe = 2, topK = 5, dims = 64, m = 16)
      .as[(Long, Long, Long, Int)].collect().toSet

  test("streamed batches == one-shot append against frozen coarse+codebooks") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.filter($"vec_id" % 3 === 0)
    val streamedIdx = scratch("streamed")
    PqIndex.build(base, streamedIdx, centroidMod = 17, dims = 64, m = 16, k = 16)
    runStream(streamedIdx, "streamed", compactEvery = 0,
      Seq(e.filter($"vec_id" % 3 === 1), e.filter($"vec_id" % 3 === 2)))
    val oneShot = scratch("oneshot")
    PqIndex.build(base, oneShot, centroidMod = 17, dims = 64, m = 16, k = 16)
    PqIndex.append(spark, oneShot, e.filter($"vec_id" % 3 =!= 0),
      dims = 64, m = 16)
    val a = answer(streamedIdx, e)
    assert(a == answer(oneShot, e))
    assert(a.nonEmpty)
    // the store partitions the full corpus exactly once, and the cells
    // sidecar tracked every batch delta
    assert(PqIndex.stats(spark, streamedIdx).collect()
      .map(_.getLong(2)).sum == e.count())
    // each batch recorded its one-row health snapshot off the sidecar
    // (organic growth → no retrain demanded)
    Seq("b0", "b1").foreach { b =>
      val h = spark.read.parquet(s"$streamedIdx/health/$b").collect()
      assert(h.length == 1, s"health/$b must hold exactly one row")
      assert(!h(0).getAs[Boolean]("needs_rebuild"))
    }
  }

  test("replayed batch rewrites its subdir and its cells delta") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("replay")
    PqIndex.build(e.filter($"vec_id" % 2 === 0), idx, centroidMod = 17,
      dims = 64, m = 16, k = 16)
    val extra = e.filter($"vec_id" % 2 === 1)
    PqIndex.appendBatch(spark, idx, extra, batchId = 7L, dims = 64, m = 16)
    val n1 = PqIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    PqIndex.appendBatch(spark, idx, extra, batchId = 7L, dims = 64, m = 16)
    val n2 = PqIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    assert(n1 == e.count())
    assert(n2 == n1)
  }

  test("compactEvery folds committed batches mid-stream; answers unchanged") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.filter($"vec_id" % 4 === 0)
    val batches = (1 to 3).map(r => e.filter($"vec_id" % 4 === r))
    val folded = scratch("folded")
    PqIndex.build(base, folded, centroidMod = 17, dims = 64, m = 16, k = 16)
    runStream(folded, "folded", compactEvery = 2, batches)
    val plain = scratch("plain")
    PqIndex.build(base, plain, centroidMod = 17, dims = 64, m = 16, k = 16)
    runStream(plain, "plain", compactEvery = 0, batches)
    assert(answer(folded, e) == answer(plain, e))
    assert(answer(folded, e).nonEmpty)
    // compaction fired at batch 1 (id % 2 == 1): b0/b1 folded, later
    // batch dirs (the replay boundary at fold time was b1, then b2 landed)
    val names = listDir(s"$folded/postings").map(_.getFileName.toString)
    assert(!names.contains("b0"), s"b0 should be folded: $names")
    assert(names.contains("b2"), s"b2 must remain its own unit: $names")
    assert(PqIndex.stats(spark, folded).collect()
      .map(_.getLong(2)).sum == e.count())
  }
}
