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
  *    `array<struct<allow boolean, path string>>`: split on newlines,
  *    keep only `Allow: /…` / `Disallow: /…` directive lines (comments,
  *    `User-agent:`, junk fields drop), extract the path. One robots
  *    body = one array row, so a crawl's robots corpus stays at DOMAIN
  *    grain — millions of rows against billions of URLs.
  *  - [[allowed]] applies RFC 9309 §2.2.2 precedence: among the rules
  *    whose path is a byte-prefix of the URL path, the LONGEST match
  *    wins, and an Allow/Disallow tie resolves to Allow; a URL no rule
  *    matches is allowed. Evaluation is per-row collection expressions
  *    over the joined rules array — the only exchange in the whole gate
  *    is the URL ⋈ robots join on the domain key (broadcast when the
  *    robots corpus is small, domain-grain shuffle otherwise).
  *
  * Out of fixture scope (documented, not silently wrong): `*`/`$`
  * wildcard paths, per-agent group selection (the parser takes the
  * whole body as one group, i.e. a single-agent file), and
  * percent-decoding — each slots into `rules`' extraction without
  * changing the evaluation shape.
  */
object Robots {

  /** `array<struct<allow, path>>` from a raw robots.txt body. */
  def rules(txt: Column): Column =
    transform(
      filter(split(txt, "\n"), l =>
        startswith(l, lit("Allow: /")) || startswith(l, lit("Disallow: /"))),
      l => struct(
        startswith(l, lit("Allow: ")).as("allow"),
        regexp_extract(l, "^(?:Allow|Disallow): (.*)$", 1).as("path")))

  /** Longest prefix-match length among rules with the given polarity;
    * -1 when none match (array_max over an empty array is null).
    */
  def bestMatch(rules: Column, path: Column, allow: Boolean): Column =
    coalesce(
      array_max(transform(
        filter(rules, r =>
          r.getField("allow") === lit(allow) &&
            startswith(path, r.getField("path"))),
        r => length(r.getField("path")))),
      lit(-1))

  /** RFC 9309 verdict: longest match wins, ties → Allow, no match → allowed. */
  def allowed(rules: Column, path: Column): Column =
    bestMatch(rules, path, allow = true) >= bestMatch(rules, path, allow = false)
}
