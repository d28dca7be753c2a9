package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    // (city, age-band, rows): one 3-class, one 2-class, one singleton
    ("aa", "x"), ("aa", "x"), ("aa", "x"),
    ("bb", "x"), ("bb", "x"),
    ("cc", "y")
  ).toDF("city", "band")

  test("kAnonymityHistogram counts classes and rows per class size") {
    val h = Privacy.kAnonymityHistogram(people, Seq($"city", $"band"))
      .orderBy($"class_size").as[(Long, Long, Long)].collect().toSeq
    assert(h == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("lDiversityHistogram: a uniform class has l=1 even when k-anonymous") {
    val rows = Seq(
      // class (aa): 3 rows, all sensitive 'S' → l=1 (k-anonymous, leaks)
      ("aa", "S"), ("aa", "S"), ("aa", "S"),
      // class (bb): 2 rows, 2 distinct sensitives → l=2
      ("bb", "S"), ("bb", "T")
    ).toDF("city", "diag")
    val h = Privacy.lDiversityHistogram(rows, Seq($"city"), $"diag")
      .orderBy($"l").as[(Long, Long, Long)].collect().toSeq
    assert(h == Seq((1L, 1L, 3L), (2L, 1L, 2L)))
  }

  test("generalizeToK picks the first rung whose min class size reaches k") {
    val rungs = Seq(
      Privacy.Rung("fine", Seq("g" -> $"city", "b" -> $"band")),
      Privacy.Rung("band_only", Seq("g" -> lit("*"), "b" -> $"band")),
      Privacy.Rung("suppressed", Seq("g" -> lit("*"), "b" -> lit("*"))))
    // k=2: fine has a singleton; band_only gives x:5, y:1 → still fails;
    // suppression always satisfies
    val (r2, c2) = Privacy.generalizeToK(people, rungs, k = 2L)
    assert(r2.name == "suppressed" && c2.count() == 1)
    // k=1: the finest rung already qualifies
    val (r1, _) = Privacy.generalizeToK(people, rungs, k = 1L)
    assert(r1.name == "fine")
  }

  test("generalizeToK refuses a ladder that never reaches k") {
    val rungs = Seq(Privacy.Rung("fine", Seq("g" -> $"city", "b" -> $"band")))
    intercept[IllegalArgumentException] {
      Privacy.generalizeToK(people, rungs, k = 4L)
    }
  }
}
