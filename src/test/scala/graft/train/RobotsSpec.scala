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
}
