package graft.streaming

import graft.SparkSpec
import graft.dedup.DedupIndex
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming dedup admission: streamed micro-batch admissions equal
  * batch appends equal one mining pass; near-dups route to the DLQ at
  * admission time; checkpoint replay is idempotent for the store AND
  * both routed tables.
  */
class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_dedupingest_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
  private def base() = docs().filter($"doc_id" % 5 =!= 0)
  private def b0() = docs().filter($"doc_id" % 10 === 0)
    .select($"doc_id", $"text")
  private def b1() = docs().filter($"doc_id" % 10 === 5)
    .select($"doc_id", $"text")

  private def prov(idx: String) =
    DedupIndex.provenance(spark, idx, docs())
      .as[(Long, Long, String, Boolean)].collect().toSet

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

  private def runStream(root: String, lands: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    val watch = s"$root/in"
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(watch)
    val q = DedupIngest.writer(stream, s"$root/idx",
        s"$root/admitted", s"$root/dlq", n = 3, threshold = 0.10)
      .option("checkpointLocation", s"$root/ckpt").start()
    lands.zipWithIndex.foreach { case (df, i) =>
      landParquet(df, watch, s"x$i")
      q.processAllAvailable()
    }
    q.stop()
  }

  private def route(root: String, name: String) =
    DedupIngest.readRoute(spark, s"$root/$name")

  test("streamed admission == batch appends == one mining pass; near-dups DLQ'd with payload") {
    val root = scratch("admit")
    DedupIndex.build(base(), s"$root/idx", n = 3, threshold = 0.10)
    runStream(root, Seq(b0(), b1()))
    // twin store: the same two admissions as direct batch appends, with
    // at-admission provenance captured after each
    val twin = scratch("admit_twin")
    DedupIndex.build(base(), twin, n = 3, threshold = 0.10)
    DedupIndex.append(spark, twin, b0(), n = 3, threshold = 0.10,
      batchId = Some(0L))
    val twinDlq0 = DedupIndex.provenance(spark, twin, b0())
      .filter($"reason" === "near_dup").select($"doc_id")
      .as[Long].collect().toSet
    DedupIndex.append(spark, twin, b1(), n = 3, threshold = 0.10,
      batchId = Some(1L))
    val twinDlq1 = DedupIndex.provenance(spark, twin, b1())
      .filter($"reason" === "near_dup").select($"doc_id")
      .as[Long].collect().toSet
    assert(prov(s"$root/idx") == prov(twin))
    // == one from-scratch mining pass over everything admitted
    val full = scratch("admit_full")
    DedupIndex.build(docs(), full, n = 3, threshold = 0.10)
    assert(prov(s"$root/idx") == prov(full))
    // routes: per-batch DLQ = the at-admission near-dups, payload intact
    val dlq0 = spark.read.parquet(s"$root/dlq/b0")
    assert(dlq0.columns.toSet == Set("doc_id", "cluster", "reason", "kept", "text"))
    assert(dlq0.select($"doc_id").as[Long].collect().toSet == twinDlq0)
    assert(spark.read.parquet(s"$root/dlq/b1")
      .select($"doc_id").as[Long].collect().toSet == twinDlq1)
    assert((twinDlq0 ++ twinDlq1).nonEmpty,
      "fixture must stream at least one near-dup into the DLQ")
    // admitted ⊎ dlq partitions exactly the streamed docs
    val streamed = (b0().unionByName(b1())).select($"doc_id")
      .as[Long].collect().toSet
    val admitted = route(root, "admitted").select($"doc_id")
      .as[Long].collect().toSet
    val dlq = route(root, "dlq").select($"doc_id").as[Long].collect().toSet
    assert(admitted.intersect(dlq).isEmpty)
    assert(admitted.union(dlq) == streamed)
    // the per-batch admission stats row carries the operator's dup-rate
    // signal, consistent with the routed tables
    Seq((0L, twinDlq0), (1L, twinDlq1)).foreach { case (b, twinDlq) =>
      val st = spark.read.parquet(s"$root/idx/stats/b$b").collect()
      assert(st.length == 1, s"stats/b$b must hold one row")
      val r = st(0)
      assert(r.getAs[Long]("n_dlq") == twinDlq.size)
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_admitted") + r.getAs[Long]("n_dlq"))
      assert(r.getAs[Long]("dlq_share_micro") ==
        twinDlq.size * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("batch_id") == b)
    }
  }

  test("compactEvery maintains the store mid-stream; provenance and versions intact") {
    val root = scratch("maint")
    DedupIndex.build(base(), s"$root/idx", n = 3, threshold = 0.10)
    val watch = s"$root/in"
    Files.createDirectories(Paths.get(watch))
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(watch)
    val q = DedupIngest.writer(stream, s"$root/idx",
        s"$root/admitted", s"$root/dlq", n = 3, threshold = 0.10,
        compactEvery = 1, keepVersions = 1)
      .option("checkpointLocation", s"$root/ckpt").start()
    landParquet(b0(), watch, "x0")
    q.processAllAvailable()
    landParquet(b1(), watch, "x1")
    q.processAllAvailable()
    q.stop()
    // pruned to base + the newest snapshot, which answers identically
    // to current provenance
    assert(DedupIndex.versions(spark, s"$root/idx") == Seq("base", "b1"))
    val cur = prov(s"$root/idx")
    assert(DedupIndex.provenanceAsOf(spark, s"$root/idx", docs(), "b1")
      .as[(Long, Long, String, Boolean)].collect().toSet == cur)
    // and the maintained store still equals one mining pass over all
    val full = scratch("maint_full")
    DedupIndex.build(docs(), full, n = 3, threshold = 0.10)
    assert(cur == prov(full))
  }

  test("checkpoint replay re-runs the last batch; store and routes unchanged") {
    val root = scratch("replay")
    DedupIndex.build(base(), s"$root/idx", n = 3, threshold = 0.10)
    runStream(root, Seq(b0(), b1()))
    val provBefore = prov(s"$root/idx")
    val dlqBefore = route(root, "dlq")
      .as[(Long, Long, String, Boolean, String)].collect().toSet
    val admittedBefore = route(root, "admitted")
      .as[(Long, Long, String, Boolean, String)].collect().toSet
    // simulate a crash after batch 1 wrote but before its offset commit:
    // drop the commit marker and restart from the same checkpoint — the
    // file source re-delivers batch 1 and foreachBatch re-runs with id=1
    val commit = new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/1")
    commit.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(commit, false) // hadoop delete drops the .crc sidecar too
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$root/in")
    val q = DedupIngest.writer(stream, s"$root/idx",
        s"$root/admitted", s"$root/dlq", n = 3, threshold = 0.10)
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()
    assert(prov(s"$root/idx") == provBefore)
    assert(route(root, "dlq")
      .as[(Long, Long, String, Boolean, String)].collect().toSet == dlqBefore)
    assert(route(root, "admitted")
      .as[(Long, Long, String, Boolean, String)].collect().toSet == admittedBefore)
    // and the store's postings were not duplicated by the replay (a dup
    // would corrupt every later Jaccard denominator)
    val postings = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/idx/postings")
    assert(postings.groupBy($"id", $"shingle").count()
      .filter($"count" > 1).count() == 0)
  }

  test("readRoute is empty-safe before the first commit") {
    val root = scratch("route_empty")
    // no stream has run: both route dirs are absent
    val core = DedupIngest.readRoute(spark, s"$root/admitted")
    assert(core.count() == 0)
    assert(core.columns.toSeq == Seq("doc_id", "cluster", "reason", "kept"))
    // with the stream's schema the monitor sees the FULL route shape
    val payload = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    val full = DedupIngest.readRoute(spark, s"$root/dlq", Some(payload))
    assert(full.count() == 0)
    assert(full.columns.toSeq ==
      Seq("doc_id", "cluster", "reason", "kept", "text"))
    // an existing-but-empty batch layout (crash before any parquet
    // landed) is also empty-safe
    Files.createDirectories(Paths.get(s"$root/dlq/b0"))
    assert(DedupIngest.readRoute(spark, s"$root/dlq").count() == 0)
    // and once real rows exist, readRoute returns them unchanged
    val idx = s"$root/idx"
    DedupIndex.build(base(), idx, n = 3, threshold = 0.10)
    runStream(root, Seq(b0()))
    assert(DedupIngest.readRoute(spark, s"$root/admitted").count() > 0)
  }
}
