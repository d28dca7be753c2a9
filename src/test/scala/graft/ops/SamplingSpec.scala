package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("shuffleShards is a reproducible permutation with dense positions") {
    val docs = spark.range(1000).select($"id".as("doc_id"))
    val a = Sampling.shuffleShards(docs, $"doc_id", "ep0", nShards = 8)
    // nothing dropped or duplicated
    assert(a.count() == 1000)
    assert(a.select($"doc_id").distinct().count() == 1000)
    // positions dense 0..n-1 within every shard
    val bad = a.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .filter($"lo" =!= 0L || $"hi" =!= $"n" - 1)
    assert(bad.count() == 0)
    // same salt = identical assignment; rerun matches row-for-row
    val b = Sampling.shuffleShards(docs, $"doc_id", "ep0", nShards = 8)
      .select($"doc_id", $"shard".as("shard2"), $"pos".as("pos2"))
    val drift = a.join(b, "doc_id")
      .filter($"shard" =!= $"shard2" || $"pos" =!= $"pos2").count()
    assert(drift == 0)
    // a new salt reorders (a fresh epoch): some doc moves
    val c = Sampling.shuffleShards(docs, $"doc_id", "ep1", nShards = 8)
      .select($"doc_id", $"shard".as("shard3"), $"pos".as("pos3"))
    val moved = a.join(c, "doc_id")
      .filter($"shard" =!= $"shard3" || $"pos" =!= $"pos3").count()
    assert(moved > 0)
    // md5 sharding is roughly balanced (no shard over 2x the mean)
    val maxN = a.groupBy($"shard").count().agg(max($"count")).as[Long].head()
    assert(maxN < 2 * 1000 / 8)
  }

  test("temperatureSqrt flattens stratum shares toward sqrt weights; scarcest stays whole-ish") {
    // 900 'big' vs 100 'small': α=½ targets shares ∝ 30:10, so small is
    // upsampled RELATIVELY (kept in full) while big downsamples to
    // C·w/n with C = min(n/w) = 100/10 = 10 → rate_big = 10·30/900 = 1/3
    val docs = (0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small"))
    val df = docs.toDF("doc_id", "lang")
    val got = Sampling.temperatureSqrt(df, "doc_id", "lang")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(got("small") > 90)          // rate 1.0 modulo hash granularity
    val bigShare = got("big").toDouble / 900
    assert(bigShare > 0.25 && bigShare < 0.42)   // ≈ 1/3
    // deterministic: same rows in, same rows out
    val again = Sampling.temperatureSqrt(df.repartition(7), "doc_id", "lang")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(again == got)
  }

  test("priority sample: k rows, ŵ = max(w, τ) ≥ w, heavy rows overrepresented") {
    // weights: ids 0..9 weigh 1000, ids 10..99 weigh 10
    val df = spark.range(100)
      .select($"id", when($"id" < 10, 1000L).otherwise(10L).as("w"))
    val out = Sampling.prioritySample(df, "id", "w", k = 20)
      .orderBy($"rank")
      .select($"rank", $"id", $"w", $"w_hat").as[(Int, Long, Long, Double)].collect()
    assert(out.length == 20 && out.map(_._1).toSeq == (1 to 20))
    out.foreach { case (_, id, w, wHat) =>
      assert(wHat >= w, s"estimator below actual weight for $id")
    }
    // the 10% heavy stratum carries 100x weight: expect a clear majority
    val heavy = out.count(_._3 == 1000L)
    assert(heavy >= 8, s"heavy rows underrepresented: $heavy/20")
  }

  test("priority sample is partitioning-invariant and reproducible") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.prioritySample(docs, "doc_id", "n_chars", 20)
      .orderBy($"rank").collect().toSeq
    val b = Sampling.prioritySample(docs.repartition(13), "doc_id", "n_chars", 20)
      .orderBy($"rank").collect().toSeq
    assert(a == b && a.size == 20)
  }

  test("reservoir: exact k per big stratum, all rows when stratum < k, matches window ref") {
    // stratum 'big' has 60 members, 'small' has 3
    val df = spark.range(63)
      .select($"id", when($"id" < 60, "big").otherwise("small").as("s"))
    val got = Sampling.reservoirPerStratum(df, "id", "s", k = 5)
      .orderBy($"stratum", $"rank")
      .select($"stratum", $"rank", $"id").as[(String, Int, Long)].collect().toSeq
    assert(got.count(_._1 == "big") == 5)
    assert(got.count(_._1 == "small") == 3)
    // reference: row_number over (hv, id) per stratum
    val hv = conv(substring(md5($"id".cast("string")), 1, 8), 16, 10).cast("long")
    val ref = df.select($"s", $"id", hv.as("hv"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"s")
          .orderBy($"hv", $"id")))
      .filter($"rnk" <= 5)
      .select($"s", $"rnk", $"id").as[(String, Int, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == ref)
  }

  test("reservoir is partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.reservoirPerStratum(docs, "doc_id", "lang", 10)
      .orderBy($"stratum", $"rank").collect().toSeq
    val b = Sampling.reservoirPerStratum(docs.repartition(17), "doc_id", "lang", 10)
      .orderBy($"stratum", $"rank").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
