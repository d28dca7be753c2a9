package graft.train

import graft.SparkSpec
import graft.text.WebClean
import org.apache.spark.sql.functions._

class WebCleanSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(WebClean.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()

  private def strip(h: String): String =
    Seq(h).toDF("h").select(WebClean.htmlStrip(col("h")).as("c"))
      .as[String].head()

  test("URL canonicalization rules fire individually and together") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/Item/?utm_source=x&id=5#frag")
      == "https://www.example.com/Path/Item?id=5")
    assert(canon("http://Host.Org:80/a/") == "http://host.org/a")
    // non-default port survives; root slash survives
    assert(canon("https://h.io:8443/") == "https://h.io:8443/")
    // utm-only query drops the '?' entirely
    assert(canon("https://h.io/p?utm_campaign=c") == "https://h.io/p")
    // middle utm keeps flanking params joined correctly
    assert(canon("https://h.io/p?a=1&utm_medium=m&b=2") == "https://h.io/p?a=1&b=2")
    // path/query case is preserved (only scheme+authority lowers)
    assert(canon("HTTP://A.B/KeepCase?Q=Mixed") == "http://a.b/KeepCase?Q=Mixed")
  }

  test("utm strip is anchored and run-safe (ADVICE r4)") {
    // a param NAME merely containing "utm_" is NOT a tracking param —
    // the unanchored pattern used to eat "xutm_a=1&" and corrupt b
    assert(canon("https://h.io/p?xutm_a=1&b=2") == "https://h.io/p?xutm_a=1&b=2")
    // consecutive utm params all strip (separator consumption halves a
    // run per pass; 4 passes cover any realistic run)
    assert(canon("https://h.io/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4&x=3")
      == "https://h.io/p?x=3")
    assert(canon("https://h.io/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4&utm_e=5&utm_f=6")
      == "https://h.io/p")
    // leading utm then non-utm keeps the '?'
    assert(canon("https://h.io/p?utm_a=1&b=2") == "https://h.io/p?b=2")
  }

  test("URL canonicalization is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=5#frag",
      "http://Host.Org:80/a/b/c?utm_a=1&utm_b=2",
      "https://plain.net/x")
    urls.foreach { u => assert(canon(canon(u)) == canon(u)) }
  }

  test("html strip removes script/style subtrees, tags, entities") {
    assert(strip("<html><body><p>hello <b>world</b></p></body></html>")
      == "hello world")
    assert(strip("<script>var x = '<p>not text</p>';</script>after")
      == "after")
    assert(strip("<style>p { color: red }</style>text") == "text")
    assert(strip("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f")
      == "a & b <c> \"d\" 'e' f")
    // double-encoded &amp;lt; decodes ONCE (to literal "&lt;"), not twice
    assert(strip("x &amp;lt; y") == "x &lt; y")
    assert(strip("  a\n\n\tb   c  ") == "a b c")
  }

  test("NFC normalization composes combining sequences, is idempotent") {
    val decomposed = "Cafe\u0301 nin\u0303o u\u0308ber"
    val composed = "Caf\u00e9 ni\u00f1o \u00fcber"
    val got = Seq(decomposed).toDF("s")
      .select(graft.functions.nfc_normalize(col("s")).as("n")).as[String].head()
    assert(got == composed)
    val again = Seq(composed).toDF("s")
      .select(graft.functions.nfc_normalize(col("s")).as("n")).as[String].head()
    assert(again == composed)
  }

  test("nfc_normalize is SQL-registered and codegen path agrees with eval") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT nfc_normalize('Cafe\u0301') AS n").as[String].head()
    assert(viaSql == "Caf\u00e9")
  }

  test("registrable domain: longest PSL rule wins, bare rules and misses null out") {
    val cases = Seq(
      "www.example.co.uk" -> (("co.uk", "example.co.uk")), // multi-label beats 'uk'-less
      "a.b.example.com" -> (("com", "example.com")),       // deep subdomain
      "example.io" -> (("io", "example.io")),
      "co.uk" -> (("co.uk", null)),                        // host IS the rule
      "example.unknown" -> ((null, null)))                 // no rule matches
    val got = graft.text.Domains
      .withRegistrable(cases.map(_._1).toDF("host"), $"host")
      .select($"host", $"etld", $"reg_domain")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"host $h") }
  }
}
