package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus cleaning stages: URL canonicalization (the key for
  * URL-level dedup in a crawl pipeline) and HTML → text extraction.
  *
  * Every pattern stays in the RE2 ∩ java.util.regex common subset so the
  * DuckDB oracle replays the exact chain (only the backreference SYNTAX
  * differs between engines: `$1` in java.regex, `\1` in RE2 — values are
  * identical). All steps are pure columnar `regexp_replace`/`replace`
  * chains: codegen'd, no UDFs, trivially scalable.
  */
object WebClean {

  /** Canonical URL form, applied in a fixed order:
    *  1. drop the fragment (`#...`),
    *  2. lowercase the scheme+authority (never the path/query),
    *  3. drop default ports (`:443` for https, `:80` for http),
    *  4. strip tracking params (`utm_*`), fixing separator artifacts,
    *  5. drop a dangling `?`/`&`,
    *  6. drop one trailing path slash — at end of string or right
    *     before the query — keeping the root slash.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val auth = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0)
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    val lowered = concat(lower(auth), rest)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?]*):443", "$1"),
      "^(http://[^/?]*):80", "$1")
    // left-anchored at a kept separator ($1) so a param merely CONTAINING
    // "utm_" (e.g. "?xutm_a=1") never matches. The separator is consumed
    // per match, so a RUN of k consecutive utm params halves per pass —
    // 4 passes cover k ≤ 16 (the documented utm_* family has ~10 names).
    // A lookbehind would do it in one pass, but RE2 (the oracle engine)
    // has no lookbehind, so the log-pass form keeps both engines exact.
    val utmMid = "([?&])utm_[a-z]+=[^&#]*&"
    val midStripped = Iterator.iterate(noPort)(
      c => regexp_replace(c, utmMid, "$1")).drop(4).next()
    val noUtm = regexp_replace(midStripped, "[?&]utm_[a-z]+=[^&#]*", "")
    val noDangle = regexp_replace(noUtm, "[?&]$", "")
    // non-root only: requires ≥1 path char between the authority's root
    // slash and the stripped one, so "https://h.io/" stays intact
    val nonRoot = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*/[^?]*[^/?])/"
    val noSlashQ = regexp_replace(noDangle, nonRoot + "\\?", "$1?")
    regexp_replace(noSlashQ, nonRoot + "$", "$1")
  }

  /** The same chain as ANSI SQL over column expression `expr` (DuckDB
    * rendering: `\1` backreferences, explicit 'g' for global).
    */
  def canonicalizeUrlSql(e: String): String = {
    val noFrag = s"regexp_replace($e, '#.*', '')"
    val auth = s"regexp_extract($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*')"
    val rest = s"regexp_replace($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', '')"
    val lowered = s"(lower($auth) || $rest)"
    val noPort = s"regexp_replace(regexp_replace($lowered, " +
      s"'^(https://[^/?]*):443', '\\1'), '^(http://[^/?]*):80', '\\1')"
    // same 4-pass anchored middle strip + trailing strip as the Column side
    val midStripped = (1 to 4).foldLeft(noPort)((acc, _) =>
      s"regexp_replace($acc, '([?&])utm_[a-z]+=[^&#]*&', '\\1', 'g')")
    val noUtm = s"regexp_replace($midStripped, '[?&]utm_[a-z]+=[^&#]*', '', 'g')"
    val noDangle = s"regexp_replace($noUtm, '[?&]$$', '')"
    val nonRoot = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*/[^?]*[^/?])/"
    val noSlashQ = s"regexp_replace($noDangle, '$nonRoot\\?', '\\1?')"
    s"regexp_replace($noSlashQ, '$nonRoot$$', '\\1')"
  }

  /** HTML → text: drop script/style subtrees (lazy dot-all spans), strip
    * remaining tags to spaces, decode the six common entities (`&amp;`
    * LAST so freshly-decoded `&` can't re-trigger), collapse whitespace.
    */
  def htmlStrip(h: Column): Column = {
    val noScript = regexp_replace(h, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** SQL rendering of [[htmlStrip]] over column expression `e`. */
  def htmlStripSql(e: String): String = {
    val noScript = s"regexp_replace($e, '(?s)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '<[^>]+>', ' ', 'g')"
    val ent = s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(regexp_replace($noTags, '&lt;', '<', 'g'), " +
      s"'&gt;', '>', 'g'), '&quot;', '\"', 'g'), '&#39;', '''', 'g'), " +
      s"'&nbsp;', ' ', 'g'), '&amp;', '&', 'g')"
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }
}
