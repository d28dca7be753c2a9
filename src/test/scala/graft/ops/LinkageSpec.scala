package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // Catalog of distinct names ≥ 13 chars (completeness precondition).
  private val catalog = Seq(
    1L -> "alpha beta gamma delta",
    2L -> "epsilon zeta eta theta",
    3L -> "iota kappa lambda mu nu",
    4L -> "omicron pi rho sigma tau",
    5L -> "upsilon phi chi psi omega")

  private def bruteForce(dirty: Seq[(Long, String)]): Set[(Long, Long, Int)] =
    (for {
      (i, d) <- dirty
      (j, c) <- catalog
      dist = levDist(d, c)
      if dist <= 1
    } yield (i, j, dist)).toSet

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("blocked fuzzyPairs == brute force for edits at EVERY position") {
    // One dirty variant per (catalog row, edit position, edit kind):
    // deletions, substitutions, and insertions across the whole string —
    // including inside the prefix-6 and suffix-6 blocks.
    val dirty = catalog.flatMap { case (id, name) =>
      val dels = name.indices.map(p =>
        name.substring(0, p) + name.substring(p + 1))
      val subs = name.indices.map(p =>
        name.substring(0, p) + "#" + name.substring(p + 1))
      val ins = (0 to name.length).map(p =>
        name.substring(0, p) + "#" + name.substring(p))
      (dels ++ subs ++ ins).zipWithIndex.map { case (d, k) =>
        (id * 1000 + k, d)
      }
    }
    val left = dirty.toDF("did", "dname")
    val right = catalog.toDF("cid", "name")
    val got = Linkage.fuzzyPairs(left, "did", "dname", right, "cid", "name",
        maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(dirty))
    assert(got.nonEmpty)
  }

  test("exact matches score dist 0; unrelated strings never pair") {
    val left = Seq(10L -> "alpha beta gamma delta",
      11L -> "totally unrelated string").toDF("did", "dname")
    val right = catalog.toDF("cid", "name")
    val got = Linkage.fuzzyPairs(left, "did", "dname", right, "cid", "name",
        maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 0)))
  }

  test("suffix block key matches right() semantics on short strings (ADVICE r4)") {
    // strings shorter than blockLen: Spark's negative-pos substring gave
    // '' while the oracle's right() gives the whole string — the clamped
    // form must agree with right() on every length
    val rows = Seq("a", "abc", "abcdef", "abcdefgh").toDF("s")
      .select(explode(Linkage.blockKeys(col("s"), 6)).as("b"), col("s"))
      .filter(col("b.tag") === "S")
      .select(col("s"), col("b.key")).as[(String, String)].collect().toMap
    assert(rows("a") == "a")
    assert(rows("abc") == "abc")
    assert(rows("abcdef") == "abcdef")
    assert(rows("abcdefgh") == "cdefgh")
  }

  test("short strings (< 2·blockLen+1 chars) lose no ED≤1 pairs (ADVICE r5)") {
    // "graft" → "grait" shifts BOTH the prefix-6 and suffix-6 block (the
    // whole 5-char string IS both blocks), so pure blocking would miss the
    // pair; the exact short-subset cross-match must recover it.
    val shortCatalog = Seq(100L -> "graft", 101L -> "spark", 102L -> "scala")
    val dirty = Seq(200L -> "grait", 201L -> "sparks", 202L -> "cala",
      203L -> "unrelated-long-string-here")
    val got = Linkage.fuzzyPairs(
        dirty.toDF("did", "dname"), "did", "dname",
        shortCatalog.toDF("cid", "name"), "cid", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (i, d) <- dirty
      (j, c) <- shortCatalog
      dist = levDist(d, c)
      if dist <= 1
    } yield (i, j, dist)).toSet
    assert(got == want)
    assert(want == Set((200L, 100L, 1), (201L, 101L, 1), (202L, 102L, 1)))
  }

  test("segment fuzzyPairsSegment == brute force at ED≤2, edits everywhere") {
    // two stacked edits per variant: delete at p then substitute at p2 —
    // positions sweep the string so edits land inside ANY gram window;
    // plus short strings that force the vacuous-bound fallback.
    val dirty = catalog.flatMap { case (id, name) =>
      (0 until name.length - 1).map { p =>
        val s1 = name.substring(0, p) + name.substring(p + 1)
        val p2 = (p * 7 + 3) % s1.length
        (id * 1000 + p, s1.substring(0, p2) + "#" + s1.substring(p2 + 1))
      }
    } ++ Seq(900001L -> "al", 900002L -> "alpha bet", 900003L -> "")
    val got = Linkage.fuzzyPairsSegment(
        dirty.toDF("did", "dname"), "did", "dname",
        catalog.toDF("cid", "name"), "cid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (i, d) <- dirty
      (j, c) <- catalog
      dist = levDist(d, c)
      if dist <= 2
    } yield (i, j, dist)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("segment path: short strings lose no pairs (blocking + short-clean fallback)") {
    // "graf"/"spa" pair through 1-char segment blocks; clean "ab" (< m
    // chars, can't fill 3 segments) must be recovered by the bounded
    // cross-match fallback
    val got = Linkage.fuzzyPairsSegment(
        Seq(1L -> "graf", 2L -> "spa", 3L -> "b").toDF("did", "dname"),
        "did", "dname",
        Seq(10L -> "graft", 11L -> "spark", 12L -> "ab").toDF("cid", "name"),
        "cid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 10L, 1)))
    assert(got.contains((2L, 11L, 2)))
    assert(got.contains((3L, 12L, 1))) // short-clean fallback pair
    // and nothing below the brute-force truth is missed
    val all = Seq(1L -> "graf", 2L -> "spa", 3L -> "b")
    val cat = Seq(10L -> "graft", 11L -> "spark", 12L -> "ab")
    val want = (for { (i, d) <- all; (j, c) <- cat; dist = levDist(d, c)
      if dist <= 2 } yield (i, j, dist)).toSet
    assert(got == want)
  }

  test("candidate volume is blocked, not the cross join") {
    // All catalog names have DISTINCT prefixes and suffixes, so each dirty
    // row can only ever meet its own source's buckets — the candidate
    // count is linear in the dirty rows, not |dirty| × |catalog|.
    val dirty = catalog.map { case (id, n) => (id + 100, n.drop(1)) }
    val left = dirty.toDF("did", "dname")
    val right = catalog.toDF("cid", "name")
    val lk = left.select(col("did"),
      explode(Linkage.blockKeys(col("dname"), 6)).as("b"))
    val rk = right.select(col("cid"),
      explode(Linkage.blockKeys(col("name"), 6)).as("b"))
    val cand = lk.join(rk, lk("b") === rk("b")).select("did", "cid").distinct()
    assert(cand.count() <= dirty.size.toLong)
  }

  test("fuzzyPairsSegment maxBucket prunes popular-prefix buckets, keeps " +
    "rare-segment recall") {
    // 40 catalog names share a popular TAIL ("report of the council") but
    // have distinct heads; dirty copies delete one char inside the
    // popular tail → the pigeonhole match goes through the RARE head
    // segment, which survives even when the cap drops the tail buckets
    val catalog = (0 until 40).map(i =>
      (i.toLong, f"unit$i%02d division report of the council"))
    val dirty = catalog.map { case (id, n) =>
      (id + 100L, n.take(34) + n.drop(35)) } // delete one tail char
    val exact = Linkage.fuzzyPairsSegment(
      dirty.toDF("did", "dname"), "did", "dname",
      catalog.toDF("cid", "name"), "cid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val capped = Linkage.fuzzyPairsSegment(
      dirty.toDF("did", "dname"), "did", "dname",
      catalog.toDF("cid", "name"), "cid", "name", maxDist = 2, maxBucket = 10)
      .as[(Long, Long, Int)].collect().toSet
    // every true (i, i+100) pair survives the cap via its rare segment
    val truth = (0 until 40).map(i => (i + 100L, i.toLong, 1)).toSet
    assert(truth.subsetOf(exact), s"exact missing ${truth -- exact}")
    assert(truth.subsetOf(capped), s"capped missing ${truth -- capped}")
  }

  test("fuzzyPairs maxBucket prunes a boilerplate block bucket; " +
    "distinctive pairs and the short leg are untouched") {
    // 50 catalog names share BOTH block keys (prefix-6 "common", suffix-6
    // "suffix") — a boilerplate bucket whose pair products the cap must
    // bound. A mid-string edit keeps the dirty copy in those same buckets,
    // so under cap 8 the boilerplate pair is DROPPED (both its buckets
    // are degenerate), while a distinctive pair (buckets of size 1) and a
    // short-string pair (exact leg, never capped) still match.
    val boiler = (0 until 50).map(k => (k.toLong, f"common $k%03d suffix"))
    val cat = boiler ++ Seq(900L -> "graft analytics engine", 901L -> "spark")
    val dirty = Seq(
      100L -> "common 0#1 suffix", // ED1 of ids 1,11,21,31,41 (boilerplate)
      190L -> "graft analytics enginX",          // ED1 of id 900
      191L -> "sparks")                          // ED1 of id 901, short leg
    val boilerMatches = Seq(1L, 11L, 21L, 31L, 41L)
      .map(j => (100L, j, 1)).toSet
    val uncapped = Linkage.fuzzyPairs(dirty.toDF("did", "dname"), "did",
        "dname", cat.toDF("cid", "name"), "cid", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(uncapped ==
      boilerMatches ++ Set((190L, 900L, 1), (191L, 901L, 1)))
    val capped = Linkage.fuzzyPairs(dirty.toDF("did", "dname"), "did",
        "dname", cat.toDF("cid", "name"), "cid", "name", maxDist = 1,
        maxBucket = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == Set((190L, 900L, 1), (191L, 901L, 1)))
  }

  test("capped is the DEFAULT: a >4096 boilerplate bucket drops without " +
    "opting in; exact completeness is the explicit Int.MaxValue opt-in") {
    // 4100 names share BOTH block keys (the 100× probes' quadratic wall:
    // 4100² ≈ 17M verification pairs if the default were exact). The
    // default call must drop the degenerate bucket and still match the
    // distinctive pair; the exact opt-in must recover the boiler match.
    val boiler = (0 until 4100).map(k => (k.toLong, f"common $k%04d suffix"))
    val cat = boiler ++ Seq(9000L -> "graft analytics engine")
    val dirty = Seq(
      100L -> "common 000#1 suffix",      // ED1 of id 1 (boiler bucket)
      190L -> "graft analytics enginX")   // ED1 of id 9000
    val bydefault = Linkage.fuzzyPairs(dirty.toDF("did", "dname"), "did",
        "dname", cat.toDF("cid", "name"), "cid", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(bydefault == Set((190L, 9000L, 1)),
      s"default path must be the capped one, got $bydefault")
    val exact = Linkage.fuzzyPairs(dirty.toDF("did", "dname"), "did",
        "dname", cat.toDF("cid", "name"), "cid", "name", maxDist = 1,
        maxBucket = Int.MaxValue)
      .as[(Long, Long, Int)].collect().toSet
    assert(exact.contains((100L, 1L, 1)) && exact.contains((190L, 9000L, 1)))
    // segment variant: same posture (default finite), cheap smoke — the
    // distinctive pair matches through the default path
    val seg = Linkage.fuzzyPairsSegment(dirty.toDF("did", "dname"), "did",
        "dname", Seq(9000L -> "graft analytics engine").toDF("cid", "name"),
        "cid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(seg == Set((190L, 9000L, 1)))
  }
}
