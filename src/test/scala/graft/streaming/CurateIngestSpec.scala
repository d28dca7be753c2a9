package graft.streaming

import graft.SparkSpec
import graft.dedup.DedupIndex
import graft.sim.{IvfIndex, PqIndex}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The composed LLM-ingest front door: dedup admission + both ANN
  * stores growing under ONE batch id / ONE checkpoint. End-state parity
  * with direct per-batch store calls, DLQ'd docs excluded from both ANN
  * stores, and a real checkpoint replay leaving every store unchanged.
  */
class CurateIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_curateingest_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  /** (doc_id, text, embedding) rows — documents with their vectors. */
  private def rows() = {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    d.join(e, d("doc_id") === e("vec_id"))
      .select(d("doc_id"), d("text"), e("embedding"))
  }
  // base on EVEN ids (the ANN gates' split: the auto-sized `id % mod`
  // centroid sample must be nonempty inside the base subset — a
  // `%5 =!= 0` base would leave `id % 20 == 0` with no survivors);
  // the streamed odd ids include near-dups of base docs, so the DLQ
  // route is exercised
  private def base() = rows().filter($"doc_id" % 2 === 0)
  private def b0() = rows().filter($"doc_id" % 4 === 1)
  private def b1() = rows().filter($"doc_id" % 4 === 3)

  private def buildStores(root: String): Unit = {
    DedupIndex.build(base().select($"doc_id", $"text"), s"$root/dedup",
      n = 3, threshold = 0.10)
    val vecs = base().select($"doc_id".as("vec_id"), $"embedding")
    IvfIndex.build(vecs, s"$root/ivf")
    PqIndex.build(vecs, s"$root/pq", centroidMod = 0, dims = 64, m = 16, k = 16)
  }

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

  private def runStream(root: String,
                        lands: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    val watch = s"$root/in"
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, embedding ARRAY<FLOAT>")
      .parquet(watch)
    val q = CurateIngest.writer(stream, s"$root/dedup", s"$root/admitted",
        s"$root/dlq", s"$root/ivf", s"$root/pq", n = 3, threshold = 0.10)
      .option("checkpointLocation", s"$root/ckpt").start()
    lands.zipWithIndex.foreach { case (df, i) =>
      landParquet(df, watch, s"x$i")
      q.processAllAvailable()
    }
    q.stop()
  }

  private def queries() = base()
    .filter($"doc_id" % 50 === 0)
    .select($"doc_id".as("vec_id"), $"embedding")
  private def ivfAnswer(idx: String) =
    IvfIndex.query(spark, idx, queries(), nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
  private def pqAnswer(idx: String) =
    PqIndex.query(spark, idx, queries(), nprobe = 2, topK = 5,
      dims = 64, m = 16)
      .as[(Long, Long, Long, Int)].collect().toSet
  test("streamed front door == direct per-batch store calls; DLQ'd docs never reach the ANN stores") {
    val root = scratch("compose")
    buildStores(root)
    runStream(root, Seq(b0(), b1()))
    // twin: the same two admissions as direct component calls
    val twin = scratch("compose_twin")
    buildStores(twin)
    Seq((b0(), 0L), (b1(), 1L)).foreach { case (df, id) =>
      val b = df.localCheckpoint(eager = true)
      val prov = DedupIndex.append(spark, s"$twin/dedup",
        b.select($"doc_id", $"text"), n = 3, threshold = 0.10,
        batchId = Some(id))
      val admitted = prov.filter($"reason" =!= "near_dup")
        .join(b, Seq("doc_id"))
        .select($"doc_id".as("vec_id"), $"embedding")
        .localCheckpoint(eager = true)
      IvfIndex.appendBatch(spark, s"$twin/ivf", admitted, id)
      PqIndex.appendBatch(spark, s"$twin/pq", admitted, id,
        dims = 64, m = 16)
    }
    assert(DedupIndex.labels(spark, s"$root/dedup")
      .as[(Long, Long)].collect().toSet ==
      DedupIndex.labels(spark, s"$twin/dedup")
        .as[(Long, Long)].collect().toSet)
    assert(ivfAnswer(s"$root/ivf") == ivfAnswer(s"$twin/ivf"))
    assert(pqAnswer(s"$root/pq") == pqAnswer(s"$twin/pq"))
    assert(ivfAnswer(s"$root/ivf").nonEmpty && pqAnswer(s"$root/pq").nonEmpty)
    // route partition: admitted ⊎ dlq = streamed; DLQ nonempty
    val streamed = (b0().unionByName(b1())).select($"doc_id")
      .as[Long].collect().toSet
    val admitted = DedupIngest.readRoute(spark, s"$root/admitted")
      .select($"doc_id").as[Long].collect().toSet
    val dlq = DedupIngest.readRoute(spark, s"$root/dlq")
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted.intersect(dlq).isEmpty)
    assert(admitted.union(dlq) == streamed)
    assert(dlq.nonEmpty, "fixture must DLQ at least one near-dup")
    // the ANN stores hold base + ADMITTED ids exactly — never a DLQ'd id
    val baseIds = base().select($"doc_id").as[Long].collect().toSet
    val ivfIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/ivf/postings").select($"id").as[Long].collect().toSet
    val pqIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/pq/postings").select($"nid").as[Long].collect().toSet
    assert(ivfIds == baseIds ++ admitted)
    assert(pqIds == baseIds ++ admitted)
    assert(dlq.forall(id => !ivfIds(id) && !pqIds(id)))
  }

  test("checkpoint replay rewrites every store's batch unit; all three unchanged") {
    val root = scratch("replay")
    buildStores(root)
    runStream(root, Seq(b0(), b1()))
    val labelsBefore = DedupIndex.labels(spark, s"$root/dedup")
      .as[(Long, Long)].collect().toSet
    val ivfBefore = ivfAnswer(s"$root/ivf")
    val pqBefore = pqAnswer(s"$root/pq")
    val admittedBefore = DedupIngest.readRoute(spark, s"$root/admitted")
      .select($"doc_id").as[Long].collect().toSet
    // crash after batch 1 wrote but before its offset commit
    val commit = new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/1")
    commit.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(commit, false)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, embedding ARRAY<FLOAT>")
      .parquet(s"$root/in")
    val q = CurateIngest.writer(stream, s"$root/dedup", s"$root/admitted",
        s"$root/dlq", s"$root/ivf", s"$root/pq", n = 3, threshold = 0.10)
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()
    assert(DedupIndex.labels(spark, s"$root/dedup")
      .as[(Long, Long)].collect().toSet == labelsBefore)
    assert(ivfAnswer(s"$root/ivf") == ivfBefore)
    assert(pqAnswer(s"$root/pq") == pqBefore)
    assert(DedupIngest.readRoute(spark, s"$root/admitted")
      .select($"doc_id").as[Long].collect().toSet == admittedBefore)
    // no store double-counts: posting id sets are exact
    Seq(s"$root/ivf/postings" -> "id", s"$root/pq/postings" -> "nid")
      .foreach { case (dir, idc) =>
        val posts = spark.read.option("recursiveFileLookup", "true").parquet(dir)
        assert(posts.groupBy(col(idc)).count().filter($"count" > 1).count() == 0,
          s"duplicated postings under $dir after replay")
      }
  }
}
