package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted dedup-lineage store: provenance-from-store parity with the
  * inline recompute, incremental append vs full rebuild, idempotent
  * refresh, and replayable batch appends.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_dedupidx_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")

  private def prov(idx: String) =
    DedupIndex.provenance(spark, idx, docs())
      .as[(Long, Long, String, Boolean)].collect().toSet

  test("provenance from the store equals the inline pair->cluster recompute") {
    val idx = scratch("parity")
    DedupIndex.build(docs(), idx, n = 3, threshold = 0.10)
    val inline = {
      val cl = Dedup.clusters(Dedup.jaccardPairs(docs(), 3, 0.10))
      docs().select($"doc_id")
        .join(cl.select($"id", $"cluster"), $"doc_id" === $"id", "left")
        .select($"doc_id",
          coalesce($"cluster", $"doc_id").as("cluster"),
          when($"cluster".isNull, lit("unique"))
            .when($"cluster" === $"doc_id", lit("representative"))
            .otherwise(lit("near_dup")).as("reason"))
        .withColumn("kept", $"reason" =!= "near_dup")
        .as[(Long, Long, String, Boolean)].collect().toSet
    }
    assert(prov(idx) == inline)
    assert(prov(idx).exists(!_._4), "fixture corpus must contain near-dups")
  }

  test("rebuild over the same corpus is idempotent") {
    val idx = scratch("refresh")
    DedupIndex.build(docs(), idx, n = 3, threshold = 0.10)
    val first = prov(idx)
    DedupIndex.build(docs(), idx, n = 3, threshold = 0.10)
    assert(prov(idx) == first)
  }

  test("incremental append equals a from-scratch rebuild") {
    val base = docs().filter($"doc_id" % 5 =!= 0)
    val extra = docs().filter($"doc_id" % 5 === 0)
    val inc = scratch("inc")
    DedupIndex.build(base, inc, n = 3, threshold = 0.10)
    DedupIndex.append(spark, inc, extra, n = 3, threshold = 0.10)
    val full = scratch("full")
    DedupIndex.build(docs(), full, n = 3, threshold = 0.10)
    assert(DedupIndex.labels(spark, inc)
      .as[(Long, Long)].collect().toSet ==
      DedupIndex.labels(spark, full)
        .as[(Long, Long)].collect().toSet)
    assert(prov(inc) == prov(full))
  }

  test("append merging two standing clusters relabels exactly like a rebuild") {
    val ta = "alpha beta gamma delta epsilon zeta"
    val tb = "one two three four five six seven"
    val base = Seq((1L, ta), (2L, ta), (10L, tb), (11L, tb))
      .toDF("doc_id", "text")
    val bridge = Seq((20L, s"$ta $tb")).toDF("doc_id", "text")
    val inc = scratch("bridge_inc")
    DedupIndex.build(base, inc, n = 3, threshold = 0.10)
    // two standing clusters before the bridge
    assert(DedupIndex.labels(spark, inc).select($"cluster")
      .distinct().as[Long].collect().toSet == Set(1L, 10L))
    DedupIndex.append(spark, inc, bridge, n = 3, threshold = 0.10)
    val full = scratch("bridge_full")
    DedupIndex.build(base.unionByName(bridge), full, n = 3, threshold = 0.10)
    val incLabels = DedupIndex.labels(spark, inc)
      .as[(Long, Long)].collect().toSet
    assert(incLabels == DedupIndex.labels(spark, full)
      .as[(Long, Long)].collect().toSet)
    // the bridge merged everything into the min-id component
    assert(incLabels.map(_._2) == Set(1L))
    assert(incLabels.map(_._1) == Set(1L, 2L, 10L, 11L, 20L))
  }

  test("as-of provenance: base view survives appends; batch view tracks them") {
    val base = docs().filter($"doc_id" % 5 =!= 0)
    val extra = docs().filter($"doc_id" % 5 === 0)
    val idx = scratch("asof")
    DedupIndex.build(base, idx, n = 3, threshold = 0.10)
    val baseView = DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect().toSet
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    assert(DedupIndex.versions(spark, idx) == Seq("base", "b0"))
    // the base view is immutable under appends
    assert(DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect().toSet == baseView)
    // docs admitted by b0 read 'unique' in the base view
    assert(baseView.filter(r => r._1 % 5 == 0).forall(_._3 == "unique"))
    // the b0 view equals current provenance, and a replayed batch
    // rewrites its own snapshot
    val b0 = DedupIndex.provenanceAsOf(spark, idx, docs(), "b0")
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(b0 == prov(idx))
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    assert(DedupIndex.provenanceAsOf(spark, idx, docs(), "b0")
      .as[(Long, Long, String, Boolean)].collect().toSet == b0)
  }

  test("compact folds append artifacts; provenance unchanged") {
    val base = docs().filter($"doc_id" % 5 =!= 0)
    val extra = docs().filter($"doc_id" % 5 === 0)
    val idx = scratch("compact")
    DedupIndex.build(base, idx, n = 3, threshold = 0.10)
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    val before = prov(idx)
    DedupIndex.compact(spark, idx)
    assert(prov(idx) == before)
  }

  test("backfill append with broadcasts gated OFF still equals a rebuild") {
    // a bulk backfill (here half the corpus) must not depend on the
    // broadcast hints: with the auto-broadcast budget disabled every
    // size-gated hint drops and the append runs its shuffle-join
    // fallback — parity with a from-scratch rebuild must hold unchanged
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = docs().filter($"doc_id" % 2 =!= 0)
      val backfill = docs().filter($"doc_id" % 2 === 0)
      val inc = scratch("backfill_inc")
      DedupIndex.build(base, inc, n = 3, threshold = 0.10)
      DedupIndex.append(spark, inc, backfill, n = 3, threshold = 0.10)
      val full = scratch("backfill_full")
      DedupIndex.build(docs(), full, n = 3, threshold = 0.10)
      assert(DedupIndex.labels(spark, inc)
        .as[(Long, Long)].collect().toSet ==
        DedupIndex.labels(spark, full)
          .as[(Long, Long)].collect().toSet)
      assert(prov(inc) == prov(full))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("compact prunes the version log; survivors byte-identical, pruned fail loudly") {
    val idx = scratch("prune")
    val parts = (0 to 2).map(r => docs().filter($"doc_id" % 5 === r))
    val rest = docs().filter($"doc_id" % 5 > 2)
    DedupIndex.build(rest, idx, n = 3, threshold = 0.10)
    parts.zipWithIndex.foreach { case (p, i) =>
      DedupIndex.append(spark, idx, p, n = 3, threshold = 0.10,
        batchId = Some(i.toLong))
    }
    assert(DedupIndex.versions(spark, idx) == Seq("base", "b0", "b1", "b2"))
    val baseView = DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect().toSet
    val b2View = DedupIndex.provenanceAsOf(spark, idx, docs(), "b2")
      .as[(Long, Long, String, Boolean)].collect().toSet
    DedupIndex.compact(spark, idx, keepVersions = 1)
    // base always survives; only the newest batch snapshot is retained
    assert(DedupIndex.versions(spark, idx) == Seq("base", "b2"))
    assert(DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect().toSet == baseView)
    assert(DedupIndex.provenanceAsOf(spark, idx, docs(), "b2")
      .as[(Long, Long, String, Boolean)].collect().toSet == b2View)
    val err = intercept[java.util.NoSuchElementException] {
      DedupIndex.provenanceAsOf(spark, idx, docs(), "b0")
    }
    assert(err.getMessage.contains("b0") && err.getMessage.contains("base"))
  }

  test("buildIfAbsent detects a store whose version log is missing") {
    val idx = scratch("halfbuilt")
    DedupIndex.build(docs(), idx, n = 3, threshold = 0.10)
    val before = prov(idx)
    // simulate a crash between the labels swap and the labels_log write:
    // labels present, version log gone — the store must not be treated
    // as complete (provenanceAsOf("base") would fail until rebuild)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/labels_log"), true)
    DedupIndex.buildIfAbsent(docs(), idx, n = 3, threshold = 0.10)
    assert(DedupIndex.versions(spark, idx) == Seq("base"))
    assert(prov(idx) == before)
    assert(DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect().toSet == before)
  }

  test("versionDiff reports exactly the docs a batch changed; same-version diff empty") {
    val base = docs().filter($"doc_id" % 5 =!= 0)
    val extra = docs().filter($"doc_id" % 5 === 0)
    val idx = scratch("vdiff")
    DedupIndex.build(base, idx, n = 3, threshold = 0.10)
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    val diff = DedupIndex.versionDiff(spark, idx, docs(), "base", "b0")
      .as[(Long, Long, String, Long, String)].collect().toSet
    // oracle: join the two full provenance views and keep changed rows
    val a = DedupIndex.provenanceAsOf(spark, idx, docs(), "base")
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val b = DedupIndex.provenanceAsOf(spark, idx, docs(), "b0")
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val manual = a.keySet.intersect(b.keySet)
      .filter(id => a(id) != b(id))
      .map(id => (id, a(id)._1, a(id)._2, b(id)._1, b(id)._2))
    assert(diff == manual)
    assert(diff.nonEmpty, "the appended batch must change some provenance")
    // every b0-admitted doc in the diff read 'unique' in the base view
    assert(diff.filter(_._1 % 5 == 0).forall(_._3 == "unique"))
    assert(DedupIndex.versionDiff(spark, idx, docs(), "b0", "b0").count() == 0)
  }

  test("stats: cluster-size histogram matches a direct recount; giant cluster fattens the tail") {
    val idx = scratch("stats")
    DedupIndex.build(docs(), idx, n = 3, threshold = 0.10)
    val viaStats = DedupIndex.stats(spark, idx).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val direct = DedupIndex.labels(spark, idx)
      .groupBy($"cluster").count()
      .select($"count".as[Long]).collect()
      .groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, v) => (b.toInt, v.length.toLong, v.sum) }.toSet
    assert(viaStats == direct)
    assert(viaStats.map(_._3).sum == DedupIndex.labels(spark, idx).count())
    // template spam: 40 copies of one page → a bucket-5 cluster appears
    val spam = (0 until 40)
      .map(i => (900000L + i, "identical boilerplate page body alpha beta gamma"))
      .toDF("doc_id", "text")
    DedupIndex.append(spark, idx, spam, n = 3, threshold = 0.10)
    val after = DedupIndex.stats(spark, idx).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(after.contains(5), s"40-doc cluster must land in bucket 5: $after")
    assert(after(5)._2 >= 40L)
  }

  test("batch append replays idempotently (crashed-retry contract)") {
    val base = docs().filter($"doc_id" % 5 =!= 0)
    val extra = docs().filter($"doc_id" % 5 === 0)
    val idx = scratch("replay")
    DedupIndex.build(base, idx, n = 3, threshold = 0.10)
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    val once = prov(idx)
    // the retry: same batch id, same docs — must rewrite, not double
    DedupIndex.append(spark, idx, extra, n = 3, threshold = 0.10,
      batchId = Some(0L))
    assert(prov(idx) == once)
    // and postings were not duplicated (a dup would corrupt n_common)
    val postings = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$idx/postings")
    assert(postings.groupBy($"id", $"shingle").count()
      .filter($"count" > 1).count() == 0)
  }
}
