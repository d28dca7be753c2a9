package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (REP, RFC 9309) parsing + evaluation — the
  * crawl-side gate every web-scale corpus build runs before a URL is
  * even fetched.
  *
  * Fully columnar, at DOMAIN grain: one robots body = one row through
  * [[rules]] / [[rulesForAgent]], so a crawl's robots corpus stays
  * millions of rows against billions of URLs, and per-rule work (regex
  * derivation, percent-decoding) happens once per RULE, not per URL.
  * The only exchange in the whole gate is the URL ⋈ robots join on the
  * domain key.
  *
  *  - Directive parsing is RFC-tolerant: names are case-insensitive and
  *    whitespace around the colon is optional (`disallow:/x`,
  *    `DISALLOW : /x`, tab-separated all parse), lines are trimmed
  *    (CRLF bodies work) and `#` comments are stripped — a compliance
  *    gate must not fail OPEN because a real-world body spells the
  *    directive in lowercase.
  *  - [[rulesForAgent]] implements §2.2.1 group selection: consecutive
  *    `User-agent:` lines head a group; the crawler's product token is
  *    matched case-insensitively and EXACTLY against each group's
  *    agents, ALL matching groups merge, and when none match the `*`
  *    groups apply. A body with no groups at all (bare rules) treats
  *    the bare rules as global — fail-safe for malformed bodies.
  *  - Rule paths and URL paths percent-decode their UNRESERVED octets
  *    (RFC 3986 §2.3: ALPHA / DIGIT / `-` `.` `_` `~`) before
  *    comparison via [[normalizePath]] — `%61` ≡ `a` per RFC 3986, so
  *    `/p%61th` and `/path` must match each other. Reserved octets
  *    (`%2F` etc.) stay encoded: decoding them would CHANGE the path
  *    structure, and leaving both sides encoded keeps the comparison
  *    exact. Apply [[normalizePath]] to the URL path before
  *    [[allowed]]; rule paths normalize at parse time.
  *  - [[allowed]] applies §2.2.2 precedence: among matching rules
  *    (byte-prefix for plain rules, a parse-time-derived start-anchored
  *    regex for rules carrying §2.2.3 `*` / trailing `$`) the rule with
  *    the most octets wins, and an Allow/Disallow tie resolves to
  *    Allow; a URL no rule matches is allowed.
  *
  * Group-id assignment inside one body is O(lines²) in collection
  * expressions (running count via slice) — robots bodies are small
  * (the de-facto cap crawlers enforce is 500 KiB, typical bodies are
  * dozens of lines) and the cost is per DOMAIN, not per URL.
  */
object Robots {

  /** Regex metacharacters escaped when a wildcard rule becomes a regex
    * (backslash first — it is the escape char itself).
    */
  val regexMetas: Seq[String] =
    Seq("\\", ".", "?", "+", "(", ")", "[", "]", "{", "}", "^", "|", "$")

  /** Percent-decode UNRESERVED octets (RFC 3986 §2.3): `%41` → `A`,
    * `%7e` → `~` (hex digits case-insensitive); reserved/invalid
    * sequences (`%2F`, `%zz`, bare `%`) pass through verbatim. Apply to
    * URL paths before [[allowed]]; [[rules]] applies it to rule paths.
    */
  def normalizePath(p: Column): Column = {
    val parts = split(p, "%", -1)
    val frag = (f: Column) => {
      val hx = substring(f, 1, 2)
      val code = conv(hx, 16, 10).cast("int")
      val unreserved = (code >= 65 && code <= 90) ||
        (code >= 97 && code <= 122) || (code >= 48 && code <= 57) ||
        code === 45 || code === 46 || code === 95 || code === 126
      when(regexp_like(hx, lit("^[0-9A-Fa-f]{2}$")) && unreserved,
        concat(char(code), substring(f, 3, 1 << 24)))
        .otherwise(concat(lit("%"), f))
    }
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, lit(2),
        greatest(size(parts) - 1, lit(0))), frag), ""))
  }

  private val uaRx = "(?i)^user-agent\\s*:"
  private val ruleRx = "(?i)^(?:allow|disallow)\\s*:"

  /** Lines → cleaned directives: strip `#` comments, trim surrounding
    * whitespace (covers CR), keep only User-agent / Allow / Disallow.
    */
  private def directives(txt: Column): Column =
    filter(
      transform(split(txt, "\n"), l =>
        regexp_replace(regexp_replace(l, "#.*", ""), "^\\s+|\\s+$", "")),
      d => regexp_like(d, lit(uaRx)) || regexp_like(d, lit(ruleRx)))

  /** One cleaned rule line → `struct<allow, path, wild, rx>` (the path
    * percent-normalized BEFORE wildcard detection and regex derivation,
    * so `%2A` can never manufacture a wildcard — `*` is not unreserved
    * and stays encoded).
    */
  private def ruleStruct(l: Column): Column = {
    val p = normalizePath(
      regexp_extract(l, "(?i)^(?:allow|disallow)\\s*:\\s*(.*)$", 1))
    val anchored = endswith(p, lit("$"))
    val body = when(anchored, substring(p, lit(1), length(p) - 1))
      .otherwise(p)
    val esc = regexMetas.foldLeft(body)((c, m) =>
      replace(c, lit(m), lit("\\" + m)))
    struct(
      regexp_like(l, lit("(?i)^allow")).as("allow"),
      p.as("path"),
      (contains(p, lit("*")) || anchored).as("wild"),
      concat(lit("^"), replace(esc, lit("*"), lit(".*")),
        when(anchored, lit("$")).otherwise(lit(""))).as("rx"))
  }

  /** Rule lines → `array<struct<allow, path, wild, rx>>`, dropping rules
    * whose (normalized) value does not start with `/` (an empty
    * `Disallow:` means "no restriction" per REP practice — it must
    * match nothing, and a non-path value is junk).
    */
  private def rulesFromLines(ls: Column): Column =
    filter(transform(ls, ruleStruct(_)),
      r => startswith(r.getField("path"), lit("/")))

  /** `array<struct<allow, path, wild, rx>>` from a raw robots.txt body,
    * agent-AGNOSTIC: every group's rules merge (the whole body as one
    * group). Use [[rulesForAgent]] when the crawler's product token
    * should select its §2.2.1 group.
    */
  def rules(txt: Column): Column =
    rulesFromLines(filter(directives(txt), d => regexp_like(d, lit(ruleRx))))

  /** §2.2.1 group-selected rules for a crawler product token:
    * `array<struct<allow, path, wild, rx>>` holding the merged rules of
    * every group whose `User-agent:` matches `agent` case-insensitively
    * and exactly; `*` groups apply only when no named group matched.
    * Rules before any `User-agent:` line (malformed body) are global —
    * included for every agent.
    */
  def rulesForAgent(txt: Column, agent: Column): Column = {
    val dirs = directives(txt)
    val n = size(dirs)
    val isUa = transform(dirs, d => regexp_like(d, lit(uaRx)))
    // 0..n-1 — via filter because sequence(0, -1) DESCENDS on an empty
    // body (Spark infers step −1 when start > stop)
    val pos = filter(sequence(lit(0), greatest(n - 1, lit(0))), i => i < n)
    // a UA line starts a new group unless it directly follows another UA
    // line (consecutive UA lines share one rule block); the i = 0 branch
    // goes through CaseWhen — && evaluates both sides, and
    // element_at(isUa, 0) is an ANSI error
    val starts = transform(pos, i =>
      element_at(isUa, i + 1) &&
        when(i === 0, lit(true)).otherwise(!element_at(isUa, i)))
    // gid(i) = running count of starts — rules before any UA line get
    // gid 0, which no UA line can own: they become the global rules
    val idx = transform(pos, i =>
      struct(
        size(filter(slice(starts, lit(1), i + 1), s => s)).as("g"),
        element_at(dirs, i + 1).as("d"),
        element_at(isUa, i + 1).as("isua")))
    val agentOf = (x: Column) => lower(regexp_extract(x.getField("d"),
      "(?i)^user-agent\\s*:\\s*(\\S*).*$", 1))
    val exactGids = array_distinct(transform(
      filter(idx, x => x.getField("isua") && agentOf(x) === lower(agent)),
      x => x.getField("g")))
    val starGids = array_distinct(transform(
      filter(idx, x => x.getField("isua") && agentOf(x) === "*"),
      x => x.getField("g")))
    val useGids = when(size(exactGids) > 0, exactGids).otherwise(starGids)
    val ruleLines = transform(
      filter(idx, x => !x.getField("isua") &&
        (array_contains(useGids, x.getField("g")) || x.getField("g") === 0)),
      x => x.getField("d"))
    rulesFromLines(ruleLines)
  }

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
