package graft.train

import graft.SparkSpec
import graft.sim.Mmr

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR skips an exact duplicate in favor of a diverse candidate") {
    // probe = id 0. id 3 duplicates id 1 exactly; id 2 is slightly less
    // relevant but diverse. After picking 0 then 1, the duplicate's
    // max-sim = 1.0 crushes its score: 7·0.9 − 3·1.0 = 3.3 < 7·0.89 −
    // 3·0.89 = 3.56 → id 2 wins round 3.
    val emb = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)),
      (1L, Seq(0.9f, 0.43589f, 0f, 0f)),
      (2L, Seq(0.89f, 0f, 0.456f, 0f)),
      (3L, Seq(0.9f, 0.43589f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Mmr.selectDiverse(emb, k = 3, lambdaTenths = 7)
      .orderBy($"rank").as[(Int, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, 1L, 2L), got.toString)
    // round 1 score is relevance-only: 7 × 1e6 µ-units of self-dot
    assert(got.head._3 == 7000000L)
  }

  test("ties break toward the smaller id") {
    val emb = Seq(
      (5L, Seq(1.0f, 0f)), (4L, Seq(1.0f, 0f)), (9L, Seq(0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Mmr.selectDiverse(emb, k = 2, lambdaTenths = 7)
      .orderBy($"rank").as[(Int, Long, Long)].collect().toSeq
    // probe is id 4 (min id); ids 4 and 5 tie on relevance → 4 first;
    // round 2: dup 5 scores 7−3 = 4e6 µ vs orthogonal 9 at 0 → 5 wins
    // (λ = 0.7 still favors relevance that strongly)
    assert(got.map(_._2) == Seq(4L, 5L), got.toString)
  }
}
