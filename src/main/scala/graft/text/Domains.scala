package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain (eTLD+1) extraction — the grouping key for
  * domain-level curation (per-site quality priors, crawl budgets, link
  * authority): the Mozilla Public Suffix List algorithm's mechanics —
  * the LONGEST rule matching a label-suffix of the host wins, and the
  * registrable domain is that rule plus one more label.
  *
  * The rule table here is an embedded subset; production swaps in the
  * published PSL (~9k rules, kilobytes) through the same API. Matching
  * is fully scan-local: rules become an array literal shipped inside
  * the plan, candidates are the host's last 1..4 label groups (PSL
  * rules never exceed 4 labels), and the longest match is picked with
  * collection expressions — no shuffle, no UDF, no join. (At full PSL
  * width the `array_contains` probe is still only ≤4 linear scans of a
  * 9k-element plan literal per row; a corpus that finds that hot can
  * swap it for a broadcast semi-join + host-grain argmax without
  * touching callers.)
  */
object Domains {

  /** Embedded default rule subset (normal rules only — wildcard `*.` and
    * exception `!` PSL rules are out of scope for the fixture).
    */
  val defaultRules: Seq[String] = Seq(
    "com", "org", "net", "io", "dev", "co.uk", "gov.uk", "ac.uk", "org.uk",
    "com.au", "net.au", "co.jp", "com.br")

  /** Adds `etld` and `reg_domain` columns: longest matching rule and
    * rule+1 label; both null when no rule matches, `reg_domain` null
    * when the host IS a bare rule.
    *
    * DataFrame-level on purpose: each stage (labels → matches → etld →
    * reg) lands as a NAMED attribute, so the non-cheap HOF subtrees are
    * evaluated once per row — a single-Column rendering duplicates the
    * `filter(transform(...))` tree ~6× in the CASE arms (Catalyst does
    * not CSE interpreted HOFs, and CollapseProject declines to inline a
    * non-cheap expression referenced more than once, which is exactly
    * the behavior this shape leans on).
    */
  def withRegistrable(df: org.apache.spark.sql.DataFrame, host: Column,
                      rules: Seq[String] = defaultRules): org.apache.spark.sql.DataFrame = {
    val ls = col("_dom_ls")
    val n = size(ls)
    df.withColumn("_dom_ls", split(host, "\\."))
      .withColumn("_dom_mm", filter(
        transform(sequence(lit(1), least(lit(4), n)),
          g => array_join(slice(ls, n - g + lit(1), g), ".")),
        c => array_contains(array(rules.map(lit): _*), c)))
      // candidates ascend in label count → longest match is the LAST one;
      // empty → null (try_element_at: ANSI element_at throws on empties)
      .withColumn("etld", try_element_at(col("_dom_mm"), lit(-1)))
      .withColumn("_dom_gs", size(split(col("etld"), "\\.")))
      .withColumn("reg_domain",
        when(col("etld").isNotNull && n > col("_dom_gs"),
          concat(element_at(ls, n - col("_dom_gs")), lit("."), col("etld"))))
      .drop("_dom_ls", "_dom_mm", "_dom_gs")
  }

  /** The rule table as a DuckDB array literal (for oracle renderings). */
  def rulesSqlArray(rules: Seq[String] = defaultRules): String =
    rules.map(r => s"'$r'").mkString("[", ", ", "]")
}
