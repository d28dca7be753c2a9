package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands near the exact distinct count (deterministic)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sk = Sketch.kmvDistinct(ev, "event_type", "user_id", 8)
    val exact = ev.groupBy($"event_type".as("grp"))
      .agg(countDistinct($"user_id").as("n"))
    val rows = sk.join(exact, Seq("grp"))
      .select($"grp", $"est_distinct", $"n")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, est, n) =>
      val ratio = est.toDouble / n
      // k=8 order-statistics estimator: loose but sane bounds; the value
      // is deterministic (md5), so this is a pin, not a flaky sample
      assert(ratio > 0.2 && ratio < 5.0, s"group $g: est=$est exact=$n")
    }
  }

  test("sketch result is partitioning-invariant (mergeable bounded state)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = Sketch.kmvDistinct(ev, "event_type", "user_id", 8)
      .orderBy($"grp").collect().toSeq
    val b = Sketch.kmvDistinct(ev.repartition(13), "event_type", "user_id", 8)
      .orderBy($"grp").collect().toSeq
    assert(a == b)
  }

  test("CMS estimates never undercount and are exact without collisions") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val cells = Sketch.cmsCells(ev, "user_id", depth = 3, width = 256)
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
    val est = Sketch.cmsEstimate(exact.select($"user_id"), cells, "user_id", 3, 256)
    val rows = est.join(exact, $"key" === $"user_id")
      .select($"key", $"est", $"exact_n").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, e, x) =>
      assert(e >= x, s"key $k undercounted: est=$e exact=$x")
    }
    // a wide sketch over this key population has collision-free rows for
    // most keys: the median estimate must equal the exact count
    val exactHits = rows.count { case (_, e, x) => e == x }
    assert(exactHits * 2 >= rows.length,
      s"only $exactHits/${rows.length} exact — sketch too narrow for the spec premise")
  }

  test("CMS point-estimate contract holds for keys absent from the corpus") {
    // absent keys must still yield a row, and any empty cell (absent from
    // the materialized cell table) participates in the min as ZERO — an
    // inner probe join would inflate or silently drop these keys
    val corpus = Seq(1L, 2L, 3L, 4L, 5L).toDF("k")
    val cells = Sketch.cmsCells(corpus, "k", depth = 3, width = 4096)
    val queried = Seq(1L, 2L, 3L, 4L, 5L, 1000L, 1001L, 1002L, 1003L, 1004L).toDF("k")
    val est = Sketch.cmsEstimate(queried, cells, "k", 3, 4096)
      .as[(Long, Long)].collect().toMap
    assert(est.keySet == queried.as[Long].collect().toSet) // every key → a row
    (1L to 5L).foreach(k => assert(est(k) >= 1L, s"present key $k"))
    // 5 keys touch ≤15 of 3·4096 cells: each md5-placed absent key finds
    // an empty cell (deterministic hash family — a pin, not a sample)
    (1000L to 1004L).foreach(k => assert(est(k) == 0L, s"absent key $k est=${est(k)}"))
  }

  test("CMS cell table is bounded by depth*width and partitioning-invariant") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = Sketch.cmsCells(ev, "user_id", 3, 64).orderBy($"j", $"p").collect().toSeq
    assert(a.size <= 3 * 64)
    val b = Sketch.cmsCells(ev.repartition(13), "user_id", 3, 64)
      .orderBy($"j", $"p").collect().toSeq
    assert(a == b)
    // merging two disjoint halves' cells by addition equals the whole
    val h1 = Sketch.cmsCells(ev.filter($"event_id" % 2 === 0), "user_id", 3, 64)
    val h2 = Sketch.cmsCells(ev.filter($"event_id" % 2 === 1), "user_id", 3, 64)
    val merged = h1.select($"j", $"p", $"cnt")
      .unionByName(h2.select($"j", $"p", $"cnt"))
      .groupBy($"j", $"p").agg(sum($"cnt").as("cnt"))
      .orderBy($"j", $"p").collect().toSeq
    assert(merged == a)
  }

  test("kmvSetOps: identical sets estimate intersect == union; disjoint clamp at 0") {
    val xs = (1L to 400L).toDF("v")
    val same = Sketch.kmvSetOps(xs, xs, "v", 8)
      .as[(Long, Long, Long, Long)].head()
    // A == B == A∪B sketches are identical → est_intersect == est_union
    assert(same._1 == same._2 && same._2 == same._3 && same._4 == same._3)
    val ys = (10001L to 10400L).toDF("v")
    val disj = Sketch.kmvSetOps(xs, ys, "v", 8)
      .as[(Long, Long, Long, Long)].head()
    // union of disjoint sets estimates ABOVE each side; the clamp keeps
    // the inclusion–exclusion intersection non-negative
    assert(disj._3 >= math.max(disj._1, disj._2))
    assert(disj._4 >= 0L)
    // estimates in a sane band around the true 400/800
    assert(disj._1 > 100L && disj._1 < 1600L, s"est_a=${disj._1}")
    assert(disj._3 > 200L && disj._3 < 3200L, s"est_union=${disj._3}")
  }

  test("kmvSetOps: below-k side falls back to its exact count, never NULL (ADVICE r4)") {
    // a has 3 distinct values (< k=8): its sketch holds every hash, so
    // the estimate is the exact count — previously the rank-k row was
    // absent and est_a / est_intersect came back NULL
    val a = Seq(1L, 2L, 3L, 3L).toDF("v")
    val b = (1L to 400L).toDF("v")
    val r = Sketch.kmvSetOps(a, b, "v", 8)
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 == 3L, s"est_a=${r._1}")
    assert(r._2 > 100L && r._2 < 1600L, s"est_b=${r._2}")
    assert(r._4 >= 0L) // defined, not NULL
    // an empty side estimates 0 and the whole row stays defined
    val empty = Seq.empty[Long].toDF("v")
    val e = Sketch.kmvSetOps(empty, b, "v", 8)
      .as[(Long, Long, Long, Long)].head()
    assert(e._1 == 0L && e._4 == 0L)
    assert(e._3 == e._2) // union of (∅, B) sketches == B's sketch
  }

  test("kmvQuantiles: sample quantiles track exact quantiles and are " +
    "partitioning-invariant") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
    val sk = Sketch.kmvQuantiles(ev, "event_type", "cents",
      $"event_id", 64, Seq(25, 50, 75))
    // exact quantiles per group (test-scale sort is fine here)
    val exact = ev.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        val v = rows.map(_._3).sorted
        def q(p: Int) = v(math.max(1, (p * v.length + 99) / 100) - 1)
        g -> (q(25), q(50), q(75), v.length)
      }
    val got = sk.select($"grp", $"p25", $"p50", $"p75", $"n_sample")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (g, p25, p50, p75, n) =>
      val (e25, e50, e75, total) = exact(g)
      assert(n == math.min(64, total).toLong)
      assert(p25 <= p50 && p50 <= p75)
      // deterministic md5 sample ⇒ these are pins, not flaky bounds:
      // with n=64 the sample median's rank concentrates near the true
      // median; allow a generous band around the exact values
      def near(got: Long, ex: Long): Boolean = {
        val spread = (e75 - e25).max(1L)
        (got - ex).abs <= 2L * spread
      }
      assert(near(p50, e50), s"$g: p50=$p50 exact=$e50")
      assert(near(p25, e25) && near(p75, e75), s"$g: $p25/$p75 vs $e25/$e75")
    }
    // mergeable bounded state: result independent of partitioning
    val b = Sketch.kmvQuantiles(ev.repartition(13).toDF(), "event_type",
      "cents", $"event_id", 64, Seq(25, 50, 75))
      .orderBy($"grp").collect().toSeq
    val a = sk.orderBy($"grp").collect().toSeq
    assert(a == b)
  }
}
