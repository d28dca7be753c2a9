package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result on skewed data") {
    // hot key: 'big' carries 90% of rows
    val left = ((1 to 900).map(i => ("big", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val right = Seq(("big", "B"), ("k1", "X"), ("k50", "Y")).toDF("key", "tag")
    val plain = left.join(right, Seq("key"))
      .select($"key", $"v", $"tag").as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", 8, "v")
      .select($"key", $"v", $"tag").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("saltedCount matches groupBy count") {
    val df = ((1 to 500).map(i => ("hot", i)) ++ (1 to 20).map(i => (s"c$i", i)))
      .toDF("key", "v")
    val got = Skew.saltedCount(df, "key", 8, "v")
      .as[(String, Long)].collect().toMap
    assert(got("hot") == 500L)
    assert(got("c7") == 1L)
    assert(got.size == 21)
  }
}
