package graft.train

import graft.SparkSpec
import graft.sim.{Clustering, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("PQ-ADC recall@5 vs exact micro-distance top-5 is pinned") {
    val pq = Pq.pqTopK(emb, dims = 64, m = 16, k = 16, topK = 5, queryMod = 50,
      lloydIters = 1)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    // exact L2 over the same micro-unit vectors
    val micro = emb.select($"vec_id".as("id"), Clustering.microVec($"embedding").as("vu"))
    val q = micro.filter(pmod($"id", lit(50)) === 0)
      .select($"id".as("qid"), $"vu".as("qv"))
    val exact = q.join(micro.select($"id".as("nid"), $"vu".as("nv")), $"qid" =!= $"nid")
      .withColumn("d",
        graft.functions.dot_product($"qv", $"qv")
          - lit(2.0) * graft.functions.dot_product($"qv", $"nv")
          + graft.functions.dot_product($"nv", $"nv"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"d", $"nid")))
      .filter($"rnk" <= 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // measured 0.42 with (m=16, k=16, one Lloyd round) on isotropic
    // synthetic vectors — PQ's worst-case geometry (the IVF pin on the
    // same data is 0.34); pinned below the measurement for stability
    assert(recall >= 0.35, s"recall@5 collapsed: $recall")
  }

  test("encoding is total and uses only codebook ids; ADC is partitioning-invariant") {
    val a = Pq.pqTopK(emb, 64, 16, 16, 5, 50, lloydIters = 1)
      .orderBy($"qid", $"rank").collect().toSeq
    val b = Pq.pqTopK(emb.repartition(13), 64, 16, 16, 5, 50, lloydIters = 1)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size == a.map(r => (r.getLong(0), r.getInt(3))).distinct.size)
  }
}
