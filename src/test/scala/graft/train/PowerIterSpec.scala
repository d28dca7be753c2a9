package graft.train

import graft.SparkSpec
import graft.sim.PowerIter
import org.apache.spark.sql.functions._

class PowerIterSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted dominant direction on an anisotropic cloud") {
    // vectors = t·u + small structured noise, u = (3,4)/5 in dims (0,1)
    // of an 8-dim space; dominant direction must align with u
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10 // -10..10 spread along u
      val n1 = ((i * 7) % 5 - 2) * 0.05
      val n2 = ((i * 11) % 5 - 2) * 0.05
      val v = Array.fill(8)(0.0f)
      v(0) = (0.6 * t + n1).toFloat
      v(1) = (0.8 * t + n2).toFloat
      v(2) = n1.toFloat; v(3) = n2.toFloat
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val dir = PowerIter.topDirection(emb, iters = 4, vecCol = "embedding")
      .orderBy($"pos").select($"v").as[Long].collect().map(_.toDouble)
    val norm = math.sqrt(dir.map(x => x * x).sum)
    val cos = (dir(0) * 0.6 + dir(1) * 0.8) / norm
    assert(math.abs(cos) > 0.99, s"direction off: cos=$cos dir=${dir.toSeq}")
  }

  test("direction is partitioning-invariant (exact integer pipeline)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = PowerIter.topDirection(emb, 4).orderBy($"pos").collect().toSeq
    val b = PowerIter.topDirection(emb.repartition(13), 4)
      .orderBy($"pos").collect().toSeq
    assert(a == b && a.size == 64)
  }
}
