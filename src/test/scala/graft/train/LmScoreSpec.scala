package graft.train

import graft.SparkSpec
import graft.text.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigram surprisal: rare contexts score high, hand-checked bits") {
    // corpus: bc = {(a,b):6, (b,a):4, (a,c):1}, cc = {a:7, b:4},
    // V = |{a,b,c,solo}| = 4 (vocabulary counts every doc's tokens,
    // including docs too short to contribute bigrams)
    val docs = Seq(
      (1L, "a b a b"),          // bigrams (a,b),(b,a),(a,b)
      (2L, "a c"),              // the rare continuation
      (3L, "a b a b a b a b"),  // (a,b)x4, (b,a)x3
      (4L, "solo")              // < 2 tokens -> no row
    ).toDF("doc_id", "text")
    val got = LmScore.surprisal(docs, $"doc_id", $"text")
      .select($"doc_id", $"n_bigrams", $"sum_bits", $"avg_bits_x100")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc1: bits(a,b) = len(bin(11)) - len(bin(7)) = 4-3 = 1 (x2)
    //       bits(b,a) = len(bin(8))  - len(bin(5)) = 4-3 = 1
    assert(got(1L) == ((1L, 3L, 3L, 100L)))
    // doc2: bits(a,c) = len(bin(11)) - len(bin(2)) = 4-2 = 2 -> 2.00 bits
    assert(got(2L) == ((2L, 1L, 2L, 200L)))
    // doc3: 4x(a,b) + 3x(b,a), all 1 bit -> 7 over 7 bigrams
    assert(got(3L) == ((3L, 7L, 7L, 100L)))
    assert(!got.contains(4L))
    // the filter semantics: the rare-context doc is the outlier
    assert(got(2L)._4 > got(1L)._4 && got(2L)._4 > got(3L)._4)
  }
}
