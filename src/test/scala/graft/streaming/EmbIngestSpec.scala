package graft.streaming

import graft.SparkSpec
import graft.sim.IvfIndex
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming embedding ingest into a persisted IVF index: streamed
  * batches equal one-shot append against the same frozen centroids, and
  * batch replay is idempotent.
  */
class EmbIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_embingest_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  /** Land `df` as parquet files inside the stream-watched dir (write to
    * a sibling, move the part files in — the file source picks up new
    * files per batch; parquet keeps float arrays exact, unlike JSON).
    */
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

  test("streamed batches == one-shot append against the same frozen centroids") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.filter($"vec_id" % 3 === 0)
    val ex1 = e.filter($"vec_id" % 3 === 1)
    val ex2 = e.filter($"vec_id" % 3 === 2)

    val streamedIdx = scratch("streamed")
    IvfIndex.build(base, streamedIdx, centroidMod = 17)
    val watch = scratch("in")
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(watch)
    val q = EmbIngest.writer(stream, streamedIdx)
      .option("checkpointLocation", scratch("ckpt")).start()
    landParquet(ex1.select($"vec_id", $"embedding"), watch, "x1")
    q.processAllAvailable()
    landParquet(ex2.select($"vec_id", $"embedding"), watch, "x2")
    q.processAllAvailable()
    q.stop()

    val oneShotIdx = scratch("oneshot")
    IvfIndex.build(base, oneShotIdx, centroidMod = 17)
    IvfIndex.append(spark, oneShotIdx, ex1.unionByName(ex2))

    val queries = e.filter($"vec_id" % 50 === 0)
    val a = IvfIndex.query(spark, streamedIdx, queries, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val b = IvfIndex.query(spark, oneShotIdx, queries, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
    // the store partitions the full corpus exactly once
    assert(IvfIndex.stats(spark, streamedIdx).collect()
      .map(_.getLong(2)).sum == e.count())
    // each batch surfaced an idempotent per-batch health row with the
    // rebuild decision (balanced organic growth → no rebuild demanded)
    Seq("b0", "b1").foreach { b =>
      val h = spark.read.parquet(s"$streamedIdx/health/$b").collect()
      assert(h.length == 1, s"health/$b must hold exactly one row")
      assert(!h(0).getAs[Boolean]("needs_rebuild"))
    }
  }

  test("replaying a batch id rewrites its subdir instead of double-appending") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.filter($"vec_id" % 2 === 0)
    val extra = e.filter($"vec_id" % 2 === 1)
    val idx = scratch("replay")
    IvfIndex.build(base, idx, centroidMod = 17)
    IvfIndex.appendBatch(spark, idx, extra, batchId = 7L)
    val n1 = IvfIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    IvfIndex.appendBatch(spark, idx, extra, batchId = 7L) // the replay
    val n2 = IvfIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    assert(n1 == e.count())
    assert(n2 == n1)
  }

  test("healthEvery samples the probe; keepHealth prunes old snapshots") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("hsample")
    IvfIndex.build(e.filter($"vec_id" % 4 === 0), idx, centroidMod = 17)
    val watch = scratch("hsample_in")
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(watch)
    val q = EmbIngest.writer(stream, idx, healthEvery = 2, keepHealth = 1)
      .option("checkpointLocation", scratch("hsample_ckpt")).start()
    (1 to 3).foreach { r =>
      landParquet(e.filter($"vec_id" % 4 === r)
        .select($"vec_id", $"embedding"), watch, s"x$r")
      q.processAllAvailable()
    }
    q.stop()
    // batches 0 and 2 probed (id % 2 == 0), batch 1 skipped; retention
    // keeps only the newest snapshot
    val snaps = listDir(s"$idx/health").map(_.getFileName.toString)
      .filter(_.matches("b\\d+"))
    assert(snaps == Seq("b2"), s"got $snaps")
  }

  test("rebuildOnDrift closes the loop: a drifting stream retrains mid-ingest") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("drift")
    IvfIndex.build(e, idx)
    // a cap of distinct vectors around corpus direction v1 (see
    // IvfIndexSpec.plantedCap): collapses into ~one cell under the
    // frozen centroids, Voronoi-splits under a retrain
    val seed = e.filter($"vec_id" === 1).select($"embedding".as("c"))
    val planted = e.crossJoin(broadcast(seed))
      .select(($"vec_id" + 10000000L).as("vec_id"),
        zip_with($"c", $"embedding", (a, b) => a + lit(0.3f) * b).as("w"))
      .withColumn("nrm", sqrt(aggregate($"w", lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .select($"vec_id",
        transform($"w", x => (x.cast("double") / $"nrm").cast("float"))
          .as("embedding"))
      .localCheckpoint(eager = true)
    val watch = scratch("drift_in")
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(watch)
    val q = EmbIngest.writer(stream, idx, rebuildOnDrift = true)
      .option("checkpointLocation", scratch("drift_ckpt")).start()
    landParquet(planted.select($"vec_id", $"embedding"), watch, "cap")
    q.processAllAvailable()
    q.stop()
    // the probe recorded the drift…
    val h = spark.read.parquet(s"$idx/health/b0").collect()
    assert(h.length == 1 && h(0).getAs[Boolean]("needs_rebuild"),
      "the batch's health row must have flagged the drift")
    // …and the inline rebuild consumed it
    assert(!IvfIndex.needsRebuild(spark, idx),
      "rebuildOnDrift must have retrained the index")
    // the retrained store ≡ a fresh auto-sized build over the union
    val fresh = scratch("drift_fresh")
    IvfIndex.build(
      e.select($"vec_id", $"embedding").unionByName(planted), fresh)
    val qs = e.filter($"vec_id" % 50 === 0)
    val a = IvfIndex.query(spark, idx, qs, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == IvfIndex.query(spark, fresh, qs, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet)
    assert(a.nonEmpty)
  }
}
