package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the persisted index lifecycle (IvfIndex / PqIndex):
  * measures BUILD and QUERY legs separately at k× organic embedding
  * growth — the split is the point (a gate run re-pays the build every
  * time; a deployment pays it once per corpus snapshot and runs many
  * query batches).
  *
  * Usage:
  *   SPARK_GRAFT_PROBE_EMB=1 SPARK_GRAFT_PROBE_SKIPDOCS=1 \
  *     sbt "runMain graft.tools.IndexProbe [base] [out] [k]"
  * Reuses an existing synthesis at `out` (same contract as ScaleProbe's
  * SPARK_GRAFT_PROBE_REUSE).
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale_probe"
    val k = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1") &&
      new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()
    if (!reuse) ScaleProbe.synthesize(spark, base, out, k)

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    // warmup (JIT/codegen)
    spark.range(1000000).selectExpr("sum(id)").collect()

    val idxRoot = s"/tmp/graft_idx_probe/p${java.lang.ProcessHandle.current().pid()}"
    def probe(tag: String, dir: String): Seq[(String, Double)] = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val ivfDir = s"$idxRoot/${tag}_ivf"
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      rows += (s"${tag}_ivf_build" ->
        timed(graft.sim.IvfIndex.build(e, ivfDir)))
      rows += (s"${tag}_ivf_query" ->
        timed(noop(graft.sim.IvfIndex.query(spark, ivfDir, q, nprobe = 2, k = 5))))
      rows += (s"${tag}_ivf_query2" ->
        timed(noop(graft.sim.IvfIndex.query(spark, ivfDir, q, nprobe = 2, k = 5))))
      val pqDir = s"$idxRoot/${tag}_pq"
      rows += (s"${tag}_pq_build" ->
        timed(graft.sim.PqIndex.build(e, pqDir, centroidMod = 0,
          dims = 64, m = 16, k = 16)))
      rows += (s"${tag}_pq_query" ->
        timed(noop(graft.sim.PqIndex.query(spark, pqDir, q,
          nprobe = 2, topK = 5, dims = 64, m = 16))))
      rows += (s"${tag}_pq_query2" ->
        timed(noop(graft.sim.PqIndex.query(spark, pqDir, q,
          nprobe = 2, topK = 5, dims = 64, m = 16))))
      // r12: per-batch health readout — cells-sidecar merge vs the
      // pre-sidecar posting re-scan (the per-micro-batch cost EmbIngest
      // pays; the sidecar path must stay flat as the store grows)
      rows += (s"${tag}_ivf_health_sidecar" ->
        timed(noop(graft.sim.IvfIndex.health(spark, ivfDir))))
      val cellsP = new org.apache.hadoop.fs.Path(s"$ivfDir/cells")
      val cfs = cellsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hidden = new org.apache.hadoop.fs.Path(s"$ivfDir/cells_hidden")
      // a stale cells_hidden from a crashed prior run would make the
      // hide-rename silently fail and the "scan" leg measure the sidecar
      cfs.delete(hidden, true)
      cfs.rename(cellsP, hidden)
      // restore even when the timed leg throws — a hidden sidecar would
      // silently degrade every later probe (and the store) to the
      // posting-scan path
      try rows += (s"${tag}_ivf_health_scan" ->
        timed(noop(graft.sim.IvfIndex.health(spark, ivfDir))))
      finally cfs.rename(hidden, cellsP)
      // r12: the rebuild maintenance op (retrain + full reassign + swap)
      rows += (s"${tag}_ivf_rebuild" ->
        timed(graft.sim.IvfIndex.rebuild(spark, ivfDir)))
      // r13: the staged PQ retrain (corpus re-read inherent — codes are
      // lossy; the swap itself is three renames per artifact)
      rows += (s"${tag}_pq_rebuild" ->
        timed(graft.sim.PqIndex.rebuild(spark, pqDir, e,
          centroidMod = 0, dims = 64, m = 16, k = 16)))
      // dedup-lineage store (r11): mine-once vs export-per-day split,
      // plus the incremental admit of a 0.1% batch — the three costs a
      // deployment actually pays. Skipped when the synthesis skipped docs.
      // plain-path guard: driver-written testdata has no _SUCCESS marker
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val dedupDir = s"$idxRoot/${tag}_dedup"
        rows += (s"${tag}_dedup_build" ->
          timed(graft.dedup.DedupIndex.build(d, dedupDir, 3, 0.10)))
        rows += (s"${tag}_dedup_export" ->
          timed(noop(graft.dedup.DedupIndex.provenance(spark, dedupDir, d))))
        rows += (s"${tag}_dedup_export2" ->
          timed(noop(graft.dedup.DedupIndex.provenance(spark, dedupDir, d))))
        val newDocs = d.orderBy(col("doc_id")).limit((d.count() / 1000).toInt max 1)
          .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
        rows += (s"${tag}_dedup_append_0.1pct" ->
          timed(graft.dedup.DedupIndex.append(spark, dedupDir, newDocs,
            3, 0.10, batchId = Some(0L))))
        // r13 flatness proof: a SECOND same-sized admission — with the
        // df/sizes sidecars the per-batch cost must not grow with the
        // store (r12 floor was the O(store) df re-aggregation, 13.0 s
        // at 100×; the remaining cost is the streamed candidate probe)
        val newDocs2 = d.orderBy(col("doc_id")).limit((d.count() / 1000).toInt max 1)
          .select((col("doc_id") + 110000000L).as("doc_id"), col("text"))
        rows += (s"${tag}_dedup_append_0.1pct_b2" ->
          timed(graft.dedup.DedupIndex.append(spark, dedupDir, newDocs2,
            3, 0.10, batchId = Some(1L))))
        // r12: the BACKFILL shape (10% of corpus in one batch) — the
        // size-gated broadcasts must degrade to shuffle joins, not OOM
        val backfill = d.orderBy(col("doc_id")).limit((d.count() / 10).toInt max 1)
          .select((col("doc_id") + 200000000L).as("doc_id"), col("text"))
        rows += (s"${tag}_dedup_append_10pct" ->
          timed(graft.dedup.DedupIndex.append(spark, dedupDir, backfill,
            3, 0.10, batchId = Some(2L))))
      }
      rows.toSeq
    }
    val all = probe("base", base) ++ probe(s"x$k", out)
    all.foreach { case (n, t) => println(s"PROBE $n ${fmt(t)}s") }
    println(all.map { case (n, t) => s""""$n":${fmt(t)}""" }
      .mkString(s"""{"metric":"index_probe","k":$k,"base":"$base","legs":{""",
        ",", "}}"))
    spark.stop()
  }
}
