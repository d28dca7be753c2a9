package graft.train

import graft.SparkSpec
import graft.text.Robots
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# policy
      |User-agent: *
      |Crawl-delay: 5
      |Disallow: /private
      |Allow: /private/pub
      |Disallow: /tmp/
      |Allow: /dup
      |Disallow: /dup
      |Disallow: /*/x
      |Disallow: /end
      |Allow: /end$
      |Allow: /""".stripMargin

  test("parser keeps only Allow/Disallow directive lines, in order") {
    val rules = Seq(body).toDF("txt")
      .select(explode(Robots.rules($"txt")).as("r"))
      .select($"r.allow", $"r.path", $"r.wild")
      .collect().map(r => (r.getBoolean(0), r.getString(1), r.getBoolean(2)))
    assert(rules.toSeq == Seq(
      (false, "/private", false), (true, "/private/pub", false),
      (false, "/tmp/", false), (true, "/dup", false), (false, "/dup", false),
      (false, "/*/x", true), (false, "/end", false), (true, "/end$", true),
      (true, "/", false)))
  }

  test("RFC 9309 precedence: longest match wins, ties allow, no match allows") {
    val cases = Seq(
      "/private"        -> false, // Disallow /private (8) > Allow / (1)
      "/private/pub/x"  -> true,  // Allow /private/pub (12) overrides
      "/privateer"      -> false, // byte-prefix semantics: /private matches
      "/tmp/f1"         -> false,
      "/dup"            -> true,  // equal-length tie resolves to Allow
      "/a/x"            -> false, // wildcard Disallow /*/x (4) beats Allow / (1)
      "/end"            -> true,  // anchored Allow /end$ (5) beats Disallow /end (4)
      "/endx"           -> false, // anchor does NOT match /endx; Disallow /end does
      "/other"          -> true)  // only Allow: / matches
    val got = cases.map(_._1).toDF("path")
      .withColumn("rules", Robots.rules(lit(body)))
      .select($"path", Robots.allowed($"rules", $"path").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (p, want) => assert(got(p) == want, s"path $p") }
  }

  test("empty rule set (no directives) allows everything") {
    val got = Seq("/a").toDF("path")
      .withColumn("rules", Robots.rules(lit("User-agent: *\n# nothing")))
      .select(Robots.allowed($"rules", $"path"))
      .head().getBoolean(0)
    assert(got)
  }

  test("directive names are case-insensitive, colon whitespace optional, " +
    "CRLF + inline comments tolerated — the gate must not fail open") {
    val messy = "User-agent: *\r\ndisallow: /a\r\nDISALLOW\t: /b # why\r\n" +
      "Disallow:/c\r\n  allow : /a/pub\r\nDisallow:\r\nDisallow: x\r\n"
    val rules = Seq(messy).toDF("txt")
      .select(explode(Robots.rules($"txt")).as("r"))
      .select($"r.allow", $"r.path")
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    // empty-value Disallow and the non-path value 'x' drop; the rest parse
    assert(rules.toSeq == Seq((false, "/a"), (false, "/b"), (false, "/c"),
      (true, "/a/pub")))
    val verdicts = Seq("/a/x", "/a/pub/y", "/b/z", "/ok").toDF("path")
      .withColumn("rules", Robots.rules(lit(messy)))
      .select($"path", Robots.allowed($"rules", $"path").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map("/a/x" -> false, "/a/pub/y" -> true,
      "/b/z" -> false, "/ok" -> true))
  }

  test("percent-decoding: unreserved octets normalize on both sides; " +
    "reserved %2F and junk sequences stay verbatim") {
    val dec = Seq("/p%61th/%7Ea", "/a%2Fb", "/x%zz%4", "/enc%41ded", "%")
      .toDF("p").select(Robots.normalizePath($"p")).as[String].collect().toSeq
    assert(dec == Seq("/path/~a", "/a%2Fb", "/x%zz%4", "/encAded", "%"))
    // a rule spelled '/p%61th' matches a URL spelled '/path' and vice versa
    val body = "User-agent: *\nDisallow: /p%61th/\nDisallow: /raw/"
    val got = Seq("/path/x", "/p%61th/x", "/r%61w/y", "/other").toDF("p")
      .withColumn("rules", Robots.rules(lit(body)))
      .select($"p", Robots.allowed($"rules", Robots.normalizePath($"p")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("/path/x" -> false, "/p%61th/x" -> false,
      "/r%61w/y" -> false, "/other" -> true))
  }

  test("§2.2.1 group selection: exact case-insensitive token match, " +
    "matching groups merge, * only as fallback, bare rules are global") {
    val body =
      """Disallow: /global/
        |User-Agent: GraftBot
        |Disallow: /gb1/
        |
        |User-agent: otherbot
        |User-agent: graftbot
        |Disallow: /gb2/
        |
        |User-agent: *
        |Disallow: /star/
        |""".stripMargin
    def rulesFor(agent: String): Seq[String] =
      Seq(body).toDF("txt")
        .select(explode(Robots.rulesForAgent($"txt", lit(agent))).as("r"))
        .select($"r.path").as[String].collect().toSeq
    // GraftBot (any casing) gets BOTH its groups + the global rule, not *
    assert(rulesFor("graftbot") == Seq("/global/", "/gb1/", "/gb2/"))
    assert(rulesFor("GRAFTBOT") == Seq("/global/", "/gb1/", "/gb2/"))
    // the consecutive-UA group serves otherbot too
    assert(rulesFor("otherbot") == Seq("/global/", "/gb2/"))
    // unknown agent falls back to the * group (+ global)
    assert(rulesFor("strangerbot") == Seq("/global/", "/star/"))
    // 'graft' is NOT a match for 'graftbot' — exact token, not substring
    assert(rulesFor("graft") == Seq("/global/", "/star/"))
  }

  test("rulesForAgent on a body with no User-agent lines serves the bare " +
    "rules to every agent; empty body yields no rules") {
    val bare = "Disallow: /a\nAllow: /a/pub"
    val got = Seq(bare).toDF("txt")
      .select(explode(Robots.rulesForAgent($"txt", lit("anybot"))).as("r"))
      .select($"r.path").as[String].collect().toSeq
    assert(got == Seq("/a", "/a/pub"))
    val empty = Seq("# nothing here\n\n").toDF("txt")
      .select(size(Robots.rulesForAgent($"txt", lit("anybot"))))
      .head().getInt(0)
    assert(empty == 0)
  }
}
