package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF index lifecycle: build/query/append determinism and
  * parity with the inline [[Similarity.ivfTopK]] path.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def scratch(tag: String): String =
    s"/tmp/graft_ivfidx_spec/p${java.lang.ProcessHandle.current().pid()}/$tag"

  test("build+query matches the inline ivfTopK path bit-for-bit") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("parity")
    IvfIndex.build(e, idx)
    val fromIndex = IvfIndex
      .query(spark, idx, e.filter($"vec_id" % 50 === 0), nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val inline = Similarity
      .ivfTopK(e, centroidMod = 0, nprobe = 2, k = 5, queryMod = 50)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromIndex == inline)
    assert(fromIndex.nonEmpty)
  }

  test("query is repeatable: two batches against one build are identical") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("repeat")
    IvfIndex.build(e, idx)
    val q = e.filter($"vec_id" % 50 === 0)
    val a = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val b = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b)
  }

  test("two-batch append equals one-shot assignment against the same frozen centroids") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.filter($"vec_id" % 5 =!= 0)
    val extra = e.filter($"vec_id" % 5 === 0)
    val a = scratch("incrA")
    IvfIndex.build(base, a, centroidMod = 17)
    IvfIndex.append(spark, a, extra)
    // same centroid table, all postings written in one append
    val b = scratch("incrB")
    copyDir(s"$a/centroids", s"$b/centroids")
    IvfIndex.append(spark, b, e)
    val q = e.filter($"vec_id" % 50 === 0)
    val qa = IvfIndex.query(spark, a, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val qb = IvfIndex.query(spark, b, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(qa == qb)
    assert(qa.nonEmpty)
  }

  test("compact folds append part-files; query results unchanged") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("compact")
    IvfIndex.build(e.filter($"vec_id" % 3 === 0), idx, centroidMod = 17)
    IvfIndex.append(spark, idx, e.filter($"vec_id" % 3 === 1))
    IvfIndex.append(spark, idx, e.filter($"vec_id" % 3 === 2))
    val q = e.filter($"vec_id" % 50 === 0)
    val before = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    def nFiles = listDir(s"$idx/postings")
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    val filesBefore = nFiles
    IvfIndex.compact(spark, idx)
    assert(nFiles < filesBefore)
    val after = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(after == before)
    assert(after.nonEmpty)
  }

  test("stats histogram partitions the corpus: n_vecs sums to vector count") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("stats")
    IvfIndex.build(e, idx)
    val st = IvfIndex.stats(spark, idx).collect()
    assert(st.map(_.getLong(2)).sum == e.count())
    // buckets are ⌊log2 size⌋: every cell in bucket b has size in [2^b, 2^b+1)
    val sizes = spark.read.parquet(s"$idx/postings")
      .groupBy($"cid").count().select($"count").as[Long].collect()
    val expect = sizes.groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .view.mapValues(v => (v.length.toLong, v.sum)).toMap
    val got = st.map(r => (r.getInt(0).toLong, (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect.map { case (k, v) => (k, v) })
  }

  test("compact swap: a kill at every step loses nothing (reads self-heal)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val master = scratch("crash_master")
    IvfIndex.build(e.filter($"vec_id" % 3 === 0), master, centroidMod = 17)
    IvfIndex.appendBatch(spark, master, e.filter($"vec_id" % 3 === 1), 0L)
    IvfIndex.appendBatch(spark, master, e.filter($"vec_id" % 3 === 2), 1L)
    val q = e.filter($"vec_id" % 50 === 0)
    def answer(idx: String) = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val expected = answer(master)
    assert(expected.nonEmpty)
    (1 to 3).foreach { k =>
      val idx = scratch(s"crash_k$k")
      copyDir(master, idx)
      val died = intercept[IllegalStateException] {
        IvfIndex.compactDir(spark, s"$idx/postings", 128L << 20, failAfter = k)
      }
      assert(died.getMessage.contains(s"step $k"))
      // the VERY NEXT read self-heals and sees the complete row set
      assert(answer(idx) == expected, s"after kill at step $k")
      // and a re-run of compaction completes and still answers identically
      IvfIndex.compact(spark, idx)
      assert(answer(idx) == expected, s"after recompact from step-$k kill")
      // no stray swap siblings survive the successful re-run
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$idx/postings__old")))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$idx/postings__compact")))
    }
  }

  test("compact preserves the newest b<N> replay unit; a replayed batch never double-counts") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("replay_boundary")
    IvfIndex.build(e.filter($"vec_id" % 3 === 0), idx, centroidMod = 17)
    val b1 = e.filter($"vec_id" % 3 === 1)
    val b2 = e.filter($"vec_id" % 3 === 2)
    IvfIndex.appendBatch(spark, idx, b1, 0L)
    IvfIndex.appendBatch(spark, idx, b2, 1L) // newest = the one a restart can replay
    IvfIndex.compact(spark, idx)
    val names = listDir(s"$idx/postings").map(_.getFileName.toString)
    assert(names.contains("b1"), s"newest batch dir folded away: $names")
    assert(!names.contains("b0"), s"committed batch dir not folded: $names")
    val n1 = IvfIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    assert(n1 == e.count())
    // checkpoint-restart replay of the uncommitted newest batch
    IvfIndex.appendBatch(spark, idx, b2, 1L)
    val n2 = IvfIndex.stats(spark, idx).collect().map(_.getLong(2)).sum
    assert(n2 == n1)
  }

  test("needsRebuild flips when append plants a cluster the frozen centroids can't split") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("drift")
    IvfIndex.build(e, idx)
    assert(!IvfIndex.needsRebuild(spark, idx),
      "fresh balanced index must not demand a rebuild")
    // tight clone cluster: half the corpus again, all one vector → one cell
    val seed = e.filter($"vec_id" === 0).select($"embedding")
    val clones = spark.range(e.count() / 2)
      .select(($"id" + 10000000L).as("vec_id"))
      .crossJoin(broadcast(seed))
    IvfIndex.append(spark, idx, clones)
    assert(IvfIndex.needsRebuild(spark, idx),
      "a third of the corpus in one fat cell must flip the flag")
    val h = IvfIndex.health(spark, idx).collect()
    assert(h.length == 1)
    assert(h(0).getAs[Long]("tail_share_micro") >= 250000L)
  }

  test("queryFiltered: predicate candidates only; true-predicate equals query()") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("filtered")
    IvfIndex.build(e, idx)
    val q = e.filter($"vec_id" % 50 === 0)
    val plain = IvfIndex.query(spark, idx, q, nprobe = 2, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val trueFiltered = IvfIndex
      .queryFiltered(spark, idx, q, nprobe = 2, k = 5, (_, _) => lit(true))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(trueFiltered == plain)
    // even-nid filter: every result passes, and the top-k equals the
    // post-filtered re-rank of an exhaustive unfiltered run (k big
    // enough to keep every probed candidate)
    val filtered = IvfIndex.queryFiltered(spark, idx, q, nprobe = 2, k = 5,
        (_, nid) => nid % 2 === 0)
      .as[(Long, Long, Double, Int)].collect()
    assert(filtered.nonEmpty)
    assert(filtered.forall(_._2 % 2 == 0))
    val exhaustive = IvfIndex.query(spark, idx, q, nprobe = 2, k = 1000000)
      .as[(Long, Long, Double, Int)].collect()
    val expected = exhaustive.filter(_._2 % 2 == 0).groupBy(_._1).toSeq
      .flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case ((_, nid, sim, _), i) => (qid, nid, sim, i + 1) }
      }.toSet
    assert(filtered.toSet == expected)
  }

  test("postings store one row per vector with its top-1 cell") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = scratch("postings")
    IvfIndex.build(e, idx)
    val post = spark.read.parquet(s"$idx/postings")
    assert(post.count() == e.count())
    assert(post.select($"id").distinct().count() == e.count())
    // every cid is a real centroid
    val cents = spark.read.parquet(s"$idx/centroids")
    assert(post.join(cents, post("cid") === cents("cid"), "left_anti").count() == 0)
  }
}
