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

  test("tClosenessProfile: hand-computed ordered EMD per class") {
    // global buckets: n0=6, n1=1, n2=5 (n=12, m=3) → cum 6, 7, 12
    // class A (0,0,1,2): cum 2,3,4 → EMD = (|2/4−6/12|+|3/4−7/12|+0)/2 = 1/12
    // class B (0,0,0,0): cum 4,4,4 → EMD = (1/2+5/12+0)/2 = 11/24
    // class C (2,2,2,2): cum 0,0,4 → EMD = (1/2+7/12+0)/2 = 13/24
    val rows = Seq(
      ("A", 0L), ("A", 0L), ("A", 1L), ("A", 2L),
      ("B", 0L), ("B", 0L), ("B", 0L), ("B", 0L),
      ("C", 2L), ("C", 2L), ("C", 2L), ("C", 2L)
    ).toDF("grp", "s")
    val got = Privacy.tClosenessProfile(rows, Seq("q" -> $"grp"), $"s")
      .orderBy($"q").as[(String, Long, Double)].collect().toSeq
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got == Seq(("A", 4L, r4(1.0 / 12)), ("B", 4L, r4(11.0 / 24)),
      ("C", 4L, r4(13.0 / 24))))
    // single global bucket: every class trivially matches → EMD 0
    val one = Seq(("A", 5L), ("B", 5L)).toDF("grp", "s")
    val g1 = Privacy.tClosenessProfile(one, Seq("q" -> $"grp"), $"s")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(g1 == Seq(("A", 1L, 0.0), ("B", 1L, 0.0)))
  }

  test("dpGeometricCounts: integer discrete-Laplace noise, clamped, " +
    "deterministic, distribution sane over many groups") {
    val rows = (0 until 200).flatMap(g => Seq.fill(g % 7 + 1)(s"g$g"))
      .toDF("grp")
    val got = Privacy.dpGeometricCounts(rows, "grp", "seed1")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.size == 200)
    got.foreach { case (g, tc, noise, dp) =>
      assert(dp >= 0L, s"$g clamp")
      assert(dp == math.max(0L, tc + noise))
      assert(noise >= -32L && noise <= 32L)
    }
    // two-sided geometric(α=1/2): mean 0, E|X| = 4/3·α/(1−α²)… loosely —
    // over 200 md5-seeded draws the sum concentrates near 0 and most
    // draws are small; these are pins (deterministic), not flaky samples
    val noises = got.map(_._3)
    assert(math.abs(noises.sum) <= 40L, s"sum=${noises.sum}")
    assert(noises.count(n => math.abs(n) <= 3) >= 180)
    // deterministic replay: same seed ⇒ identical release
    val again = Privacy.dpGeometricCounts(rows.repartition(7), "grp", "seed1")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(again == got.sortBy(_._1))
    // different seed ⇒ a different (but equally valid) noise draw
    val other = Privacy.dpGeometricCounts(rows, "grp", "seed2")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(other.map(_._3) != again.map(_._3))
  }

  test("dpGeometricCounts over a public domain: absent groups release a " +
    "noised zero, surprise keys drop — presence no longer leaks") {
    val rows = Seq("a", "a", "a", "b", "zz").toDF("grp") // zz ∉ domain
    val domain = Seq("a", "b", "c", "d").toDF("k")
    val got = Privacy.dpGeometricCounts(rows, "grp", "seed1", domain)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // one row PER DOMAIN KEY — c and d appear with true_count 0
    assert(got.map(_._1) == Seq("a", "b", "c", "d"))
    assert(got.collect { case (g, tc, _, _) if g == "a" => tc } == Seq(3L))
    assert(got.collect { case (g, tc, _, _) if g >= "c" => tc } == Seq(0L, 0L))
    got.foreach { case (g, tc, noise, dp) =>
      assert(dp == math.max(0L, tc + noise), s"$g clamp")
    }
    // same noise draw as the bare mechanism at the same (seed, group):
    // the release is indistinguishable between zero-count and missing
    val bare = Privacy.dpGeometricCounts(rows.filter($"grp" =!= "zz"), "grp", "seed1")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(bare.map(r => (r._1, r._3)) ==
      got.filter(r => Set("a", "b")(r._1)).map(r => (r._1, r._3)))
  }

  test("dpHistogramQuantiles: deterministic, monotone, and noise-robust " +
    "on a planted two-spike histogram") {
    // 1000 rows in bucket 2, 1000 in bucket 5; geometric noise per bucket
    // is bounded by ±32, so with 8 buckets the released cumulative moves
    // by at most 256 — p25 MUST land on bucket 2 and p75 on bucket 5
    val rows = (Seq.fill(1000)(2L) ++ Seq.fill(1000)(5L)).toDF("b")
    val got = Privacy.dpHistogramQuantiles(rows, "b", "seedq", 8,
        Seq(25, 50, 75, 90, 99))
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(25, 50, 75, 90, 99))
    val byPct = got.toMap
    assert(byPct(25) == 2L)
    assert(byPct(75) == 5L)
    // released quantiles are monotone in pct (cumulative is monotone)
    assert(got.map(_._2) == got.map(_._2).sorted)
    // same seed → bit-identical release (audit replay)
    val again = Privacy.dpHistogramQuantiles(rows, "b", "seedq", 8,
        Seq(25, 50, 75, 90, 99))
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(again == got)
    // out-of-range pcts refuse loudly instead of silently releasing fewer
    // quantiles than asked for
    for (bad <- Seq(Seq(0), Seq(101), Seq(50, 200), Seq.empty[Int]))
      intercept[IllegalArgumentException] {
        Privacy.dpHistogramQuantiles(rows, "b", "seedq", 8, bad)
      }
  }
}
