package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("percent_encode matches urllib.parse.quote(safe=':/') semantics") {
    // expectations computed with CPython urllib.parse.quote + %3A-restore
    val cases = Seq(
      "data/content/file-c1.txt" -> "data/content/file-c1.txt",
      "file:/B/S/doc x.txt" -> "file:/B/S/doc%20x.txt",
      "a b,c:d/e" -> "a%20b%2Cc:d/e",
      "weird&chars?#[]@!$'()*+;=" -> "weird%26chars%3F%23%5B%5D%40%21%24%27%28%29%2A%2B%3B%3D",
      "unreserved_.-~AZaz09" -> "unreserved_.-~AZaz09",
      "café/ü" -> "caf%C3%A9/%C3%BC",   // UTF-8 bytes percent-encoded
      "" -> "")
    cases.foreach { case (in, want) =>
      assert(PercentEncode.encode(in) == want, s"for '$in'")
    }
    // and through the Column API / Catalyst path
    val got = cases.map(_._1).toDF("s")
      .select(percent_encode($"s").as("e")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("replace_first replaces only the first literal occurrence") {
    val got = Seq(
      ("data/data/x", "data/", "P/"),
      ("nope", "data/", "P/"),
      ("xdata/y", "data/", "P/"),
      ("", "data/", "P/"))
      .toDF("s", "f", "r")
      .select(replace_first($"s", $"f", $"r")).as[String].collect()
    assert(got.toSeq == Seq("P/data/x", "nope", "xP/y", ""))
  }

  test("replace_first handles regex metacharacters literally") {
    val got = Seq(("a.b.c", ".", "-")).toDF("s", "f", "r")
      .select(replace_first($"s", $"f", $"r")).as[String].collect()
    assert(got.head == "a-b.c")
  }

  test("topk_by matches the window row_number rendering (declarative parity)") {
    import org.apache.spark.sql.expressions.Window
    // many groups, duplicate scores to exercise the nid tie-break, and
    // more rows than k so eviction actually happens
    val rows = for { q <- 0L until 20L; n <- 0L until 37L if n != q }
      yield (q, n, math.round(math.sin(q * 37 + n) * 1e6) / 1e6)
    val df = rows.toDF("qid", "nid", "sim").repartition(8)
    val viaAgg = df.groupBy($"qid")
      .agg(topk_by($"sim", $"nid", 5).as("top"))
      .select($"qid", explode($"top").as("t"))
      .select($"qid", $"t.nid", $"t.sim", $"t.rank")
      .orderBy($"qid", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"nid")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .orderBy($"qid", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("topk_by plan shows map-side partial aggregation (pushdown, not a window sort)") {
    val df = (0L until 100L).map(i => (i % 4, i, i * 0.5)).toDF("qid", "nid", "sim")
      .repartition(4)
    val agg = df.groupBy($"qid").agg(topk_by($"sim", $"nid", 3).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by"), s"no partial aggregation in:\n$plan")
  }

  test("sorted_intersect_count matches size(array_intersect) (declarative " +
    "parity) over random sorted distinct arrays incl. empty/disjoint") {
    val rng = new scala.util.Random(7)
    val cases = (0 until 40).map { _ =>
      val a = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong).distinct.sorted
      (a, b)
    } ++ Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(5L), Seq.empty[Long]),
      (Seq(1L, 3L), Seq(2L, 4L)))
    val df = cases.toDF("a", "b")
    val got = df.select(sorted_intersect_count($"a", $"b"),
      size(array_intersect($"a", $"b")).cast("long"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, d) => assert(n == d, s"native $n vs declarative $d") }
  }
}
