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

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val s = Paths.get(src)
    val d = Paths.get(dst)
    Files.createDirectories(d)
    Files.walk(s).forEach { p: Path =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

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
    def nFiles = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$idx/postings"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).count()
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
