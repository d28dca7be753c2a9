package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (REP, RFC 9309) parsing + evaluation — the
  * crawl-side gate every web-scale corpus build runs before a URL is
  * even fetched.
  *
  * Two pieces, both fully columnar:
  *
  *  - [[rules]] parses a raw `robots.txt` body into
  *    `array<struct<allow, path, wild, rx>>`: split on newlines, keep
  *    only `Allow: /…` / `Disallow: /…` directive lines (comments,
  *    `User-agent:`, junk fields drop), extract the path, and — for
  *    rules carrying RFC 9309 §2.2.3 special characters (`*` any-
  *    sequence, trailing `$` end-anchor) — derive a start-anchored
  *    regex at parse time (metacharacters escaped, `*` → `.*`, the
  *    trailing `$` kept as the anchor). One robots body = one array
  *    row, so a crawl's robots corpus stays at DOMAIN grain — millions
  *    of rows against billions of URLs, and the per-rule regex work
  *    happens once per RULE, not per URL.
  *  - [[allowed]] applies §2.2.2 precedence: among matching rules
  *    (byte-prefix for plain rules, the derived regex for wildcard
  *    rules) the rule with the most octets wins, and an Allow/Disallow
  *    tie resolves to Allow; a URL no rule matches is allowed.
  *    Evaluation is per-row collection expressions over the joined
  *    rules array — the only exchange in the whole gate is the
  *    URL ⋈ robots join on the domain key.
  *
  * Out of fixture scope (documented, not silently wrong): per-agent
  * group selection (the parser takes the whole body as one group) and
  * percent-decoding — each slots into `rules`' extraction without
  * changing the evaluation shape.
  */
object Robots {

  /** Regex metacharacters escaped when a wildcard rule becomes a regex
    * (backslash first — it is the escape char itself).
    */
  val regexMetas: Seq[String] =
    Seq("\\", ".", "?", "+", "(", ")", "[", "]", "{", "}", "^", "|", "$")

  /** `array<struct<allow, path, wild, rx>>` from a raw robots.txt body. */
  def rules(txt: Column): Column =
    transform(
      filter(split(txt, "\n"), l =>
        startswith(l, lit("Allow: /")) || startswith(l, lit("Disallow: /"))),
      l => {
        val p = regexp_extract(l, "^(?:Allow|Disallow): (.*)$", 1)
        val anchored = endswith(p, lit("$"))
        val body = when(anchored, substring(p, lit(1), length(p) - 1))
          .otherwise(p)
        val esc = regexMetas.foldLeft(body)((c, m) =>
          replace(c, lit(m), lit("\\" + m)))
        struct(
          startswith(l, lit("Allow: ")).as("allow"),
          p.as("path"),
          (contains(p, lit("*")) || anchored).as("wild"),
          concat(lit("^"), replace(esc, lit("*"), lit(".*")),
            when(anchored, lit("$")).otherwise(lit(""))).as("rx"))
      })

  /** Longest match (rule octets, RFC 9309 §2.2.2) among rules with the
    * given polarity; -1 when none match (array_max over empty is null).
    */
  def bestMatch(rules: Column, path: Column, allow: Boolean): Column =
    coalesce(
      array_max(transform(
        filter(rules, r =>
          r.getField("allow") === lit(allow) &&
            when(r.getField("wild"), regexp_like(path, r.getField("rx")))
              .otherwise(startswith(path, r.getField("path")))),
        r => length(r.getField("path")))),
      lit(-1))

  /** RFC 9309 verdict: longest match wins, ties → Allow, no match → allowed. */
  def allowed(rules: Column, path: Column): Column =
    bestMatch(rules, path, allow = true) >= bestMatch(rules, path, allow = false)
}
