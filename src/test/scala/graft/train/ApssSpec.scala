package graft.train

import graft.SparkSpec
import graft.text.{Apss, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ApssSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive reference: full postings self-join (no pruning), integer
    * cosine acceptance ov²·tDen² ≥ tNum²·na·nb over raw shingle strings.
    */
  private def brute(docs: DataFrame, tNum: Int, tDen: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sh = docs.select($"doc_id".as("id"),
      explode(array_distinct(TextAnalysis.shingles($"text", 3))).as("s"))
    val sz = sh.groupBy($"id").agg(count(lit(1)).as("n"))
    val co = sh.as("a").join(sh.as("b"), $"a.s" === $"b.s" && $"a.id" < $"b.id")
      .groupBy($"a.id".as("aid"), $"b.id".as("bid")).agg(count(lit(1)).as("ov"))
    co.join(sz.select($"id".as("aid"), $"n".as("na")), "aid")
      .join(sz.select($"id".as("bid"), $"n".as("nb")), "bid")
      .filter($"ov" * $"ov" * (tDen.toLong * tDen) >= $"na" * $"nb" * (tNum.toLong * tNum))
      .select($"aid", $"bid", $"ov".cast("long"), $"na", $"nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("prefix-filtered pairs == exhaustive all-pairs on real docs (exactness)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Apss.cosinePairs(docs, n = 3, tNum = 4, tDen = 5)
      .select($"aid", $"bid", $"ov", $"na", $"nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = brute(docs, 4, 5)
    assert(got == want)
    assert(want.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("boundary pair at EXACTLY cos = t survives the prefix + size filters") {
    // unique-word docs: 27 tokens → 25 distinct 3-gram shingles each; B
    // shares A's 22-token tail run → 20 shared shingles; cos = 20/25 = 0.8
    val a = (1 to 27).map(i => s"t$i").mkString(" ")
    val b = ((6 to 27).map(i => s"t$i") ++ (1 to 5).map(i => s"u$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Apss.cosinePairs(docs, n = 3, tNum = 4, tDen = 5)
      .select($"aid", $"bid", $"ov", $"na", $"nb").as[(Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 2L, 20L, 25L, 25L)))
    // one fewer shared shingle → 19/25 = 0.76 < 0.8 → excluded
    val b2 = ((7 to 27).map(i => s"t$i") ++ (1 to 6).map(i => s"u$i")).mkString(" ")
    val docs2 = Seq((1L, a), (2L, b2)).toDF("doc_id", "text")
    assert(Apss.cosinePairs(docs2, n = 3, tNum = 4, tDen = 5).count() == 0L)
  }

  test("maxDf cap drops boilerplate-only candidates, keeps distinctive pairs") {
    // 40 docs share one boilerplate phrase; docs 1 and 2 additionally share
    // a long distinctive run (a genuine near-dup pair).
    val boiler = "all rights reserved contact us for terms"
    val run = (1 to 30).map(i => s"d$i").mkString(" ")
    val rows =
      Seq((1L, s"$run $boiler"), (2L, s"$run $boiler")) ++
        (3L to 40L).map(i => (i, s"${(1 to 30).map(j => s"x${i}_$j").mkString(" ")} $boiler"))
    val docs = rows.toDF("doc_id", "text")
    val capped = Apss.cosinePairs(docs, n = 3, tNum = 4, tDen = 5, maxDf = 10L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    // the (1,2) dup meets on its rare distinctive shingles despite the cap
    assert(capped.contains((1L, 2L)))
    // boilerplate-only doc pairs never qualify (cos over full sets is low)
    // and with the cap their only shared bucket is gone from candidates
    assert(capped == Set((1L, 2L)))
    // uncapped gives the same ANSWER here (cap only affects candidates)
    val exact = Apss.cosinePairs(docs, n = 3, tNum = 4, tDen = 5)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(exact == capped)
  }
}
