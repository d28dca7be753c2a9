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
}
