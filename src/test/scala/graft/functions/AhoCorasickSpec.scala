package graft.functions

import graft.SparkSpec
import graft.text.Blocklist
import org.apache.spark.sql.functions._

class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  /** naive all-occurrence counter (overlapping included) */
  private def naive(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      var c = 0L
      var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
      c
    }

  test("counts every occurrence, overlapping across patterns included") {
    val pats = Seq("ab", "aba", "ba", "b")
    val texts = Seq("ababab", "abba", "", "xyz", "bababab", "aabbaabb")
    val got = texts.toDF("t")
      .select(Blocklist.counts($"t", pats)).as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == naive(t, pats), s"text '$t'")
    }
  }

  test("bordered pattern: automaton counts overlaps, replace-scan does not") {
    val got = Seq("aaaa").toDF("t")
      .select(Blocklist.counts($"t", Seq("aa")),
        Blocklist.countsDeclarative($"t", Seq("aa")))
      .as[(Seq[Long], Seq[Long])].head()
    assert(got._1 == Seq(3L)) // positions 0,1,2 — all occurrences
    assert(got._2 == Seq(2L)) // left-to-right non-overlapping
  }

  test("parity with the declarative rendering on real docs (border-free phrases)") {
    val pats = Seq("fast key", "hash scan join", "order batch", "stream spark")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        Blocklist.counts($"text", pats).as("ac"),
        Blocklist.countsDeclarative($"text", pats).as("dec"))
      .filter($"ac" =!= $"dec").count()
    assert(diff == 0L)
    // and the scan actually fires on the fixture
    val total = docs.select(
      aggregate(Blocklist.counts($"text", pats), lit(0L), _ + _).as("s"))
      .agg(sum($"s")).as[Long].head()
    assert(total > 0L)
  }

  test("null text yields null; multi-byte UTF-8 patterns match byte-exactly") {
    val got = Seq[Option[String]](None, Some("café café"))
      .toDF("t").select(Blocklist.counts($"t", Seq("café")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got(0) == null)
    assert(got(1) == Seq(2L))
  }

  test("SQL surface: ac_counts registered via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT ac_counts('ababab', array('ab', 'ba')) AS c").as[Seq[Long]].head()
    assert(out == Seq(3L, 2L))
  }
}
