package graft.train

import graft.SparkSpec
import graft.text.Collocations
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("an exclusive pair outranks a promiscuous pair at equal frequency") {
    // "san francisco" only ever co-occur; "the cat"/"the dog" share "the"
    val docs = Seq.fill(6)("san francisco the cat the dog x1 x2")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Collocations.topPmi(docs, "text", minCount = 5, k = 10)
      .select($"w1", $"w2", $"pmi_score_x1m").as[(String, String, Long)].collect()
    val score = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(score(("san", "francisco")) > score(("the", "cat")),
      s"exclusive pair must win: $score")
  }

  test("score is the exact scaled rational N·c_ab·10⁶ DIV (c_a·c_b)") {
    val docs = Seq((1L, "a b a b a b a b a b")).toDF("doc_id", "text")
    // tokens: a b ×5 → bigrams: (a,b)×5, (b,a)×4; N=9; c_a=c_b=5
    val out = Collocations.topPmi(docs, "text", minCount = 4, k = 10)
      .select($"w1", $"w2", $"c_ab", $"pmi_score_x1m")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(("a", "b", 5L, 9L * 5 * 1000000 / 25),
      ("b", "a", 4L, 9L * 4 * 1000000 / 25)))
  }

  test("top-k is deterministic under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Collocations.topPmi(docs, "text", 5, 50).collect().toSeq
    val b = Collocations.topPmi(docs.repartition(13), "text", 5, 50).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
