package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight matches a plain-Scala inverse-CDF on raw uniforms") {
    val us = Seq(0L, 790015082L, 790015083L, 1580030166L, 1580030167L,
      2147461637L, Bootstrap.P - 1)
    val got = us.toDF("u").select(Bootstrap.poissonWeight($"u"))
      .as[Long].collect().toSeq
    val want = us.map(u => Bootstrap.poissonCuts.count(c => u >= c).toLong)
    assert(got == want)
    // the cut boundaries themselves: below cut0 → 0 copies, at cut0 → 1
    assert(got.take(3) == Seq(0L, 0L, 1L))
    // cut sanity: ~e⁻¹ of the P-range sits below cut0 (zero copies)
    assert(math.abs(Bootstrap.poissonCuts.head.toDouble / Bootstrap.P
      - math.exp(-1.0)) < 1e-9)
  }

  test("Carter–Wegman replicate mixes: one md5 digest per row drives all " +
    "replicates; draws match a plain-Scala replay of the same constants") {
    val ids = Seq(1L, 2L, 17L, 999999L)
    val got = ids.toDF("id").transform(d =>
        Bootstrap.poissonBucketCounts(d.withColumn("b", lit(0L)), "id", "b",
          replicates = 8, seed = "cwspec"))
      .select($"rep", $"n").orderBy($"rep").as[(Int, Long)].collect().toMap
    // plain-Scala replay: same md5 lanes, same literal (a, b) mixes
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0 until 8).map { r =>
      val (a, b) = Bootstrap.cwConsts("cwspec", r)
      val w = ids.map { id =>
        val m = hex(s"cwspec|$id")
        val lane = java.lang.Long.parseLong(
          m.substring((r % 4) * 8, (r % 4) * 8 + 8), 16) % Bootstrap.P
        val u = (a * lane + b) % Bootstrap.P
        Bootstrap.poissonCuts.count(c => u >= c).toLong
      }.sum
      r -> w
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("poissonMeans: deterministic, unbiased within tolerance, weights " +
    "near R·n in total") {
    val n = 2000
    val rows = (1 to n).map(i => (i.toLong, (i % 100).toLong * 100))
      .toDF("id", "cents")
    val trueMeanMicro = rows.agg(expr("(sum(cents) * 1000000) DIV count(*)"))
      .head().getLong(0)
    val reps = Bootstrap.poissonMeans(rows, "id", "cents", 16, "bootspec")
      .orderBy($"rep").as[(Int, Long, Long)].collect().toSeq
    assert(reps.map(_._1) == (0 until 16))
    // Poisson(1) weights: E[Σw per replicate] = n; 5σ band ≈ 5·√n
    reps.foreach { case (r, ne, _) =>
      assert(math.abs(ne - n) <= 5 * math.sqrt(n).toLong + 1, s"rep $r n_eff $ne")
    }
    // each replicate mean sits near the corpus mean: σ(x) ≈ 2886 cents,
    // so σ(replicate mean) ≈ 2886/√2000 ≈ 64.6 cents ≈ 64.6e6 micro;
    // allow 5σ ≈ 3.25e8 micro
    reps.foreach { case (r, _, m) =>
      assert(math.abs(m - trueMeanMicro) < 325000000L,
        s"rep $r mean $m vs $trueMeanMicro")
    }
    // bit-identical on re-run (audit replay)
    val again = Bootstrap.poissonMeans(rows, "id", "cents", 16, "bootspec")
      .orderBy($"rep").as[(Int, Long, Long)].collect().toSeq
    assert(again == reps)
    // a different seed draws different replicates
    val other = Bootstrap.poissonMeans(rows, "id", "cents", 16, "bootspec2")
      .orderBy($"rep").as[(Int, Long, Long)].collect().toSeq
    assert(other != reps)
  }
}
