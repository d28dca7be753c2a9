package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: match "dirty" entity strings against a clean
  * catalog within a small edit distance, WITHOUT the n×m cross join.
  *
  * Blocking scheme (the scale story): each string emits two block keys —
  * its first `blockLen` chars (tag P) and its last `blockLen` chars
  * (tag S). A single edit (insert / delete / substitute) at position p
  * leaves the first-`blockLen` prefix byte-identical when p ≥ blockLen,
  * and leaves the last-`blockLen` suffix byte-identical when the edit
  * happens before those final characters — so for strings of length
  * ≥ 2·blockLen+1, ANY pair at edit distance ≤ 1 shares at least one
  * block key (pigeonhole over the two ends). The candidate join is
  * therefore COMPLETE for maxDist = 1, and candidate volume is bounded
  * by Σ bucket² over shared prefixes/suffixes — the duplicated mass,
  * never |left|×|right|. LinkageSpec proves completeness against the
  * brute-force cross join at test scale.
  *
  * Rescoring uses Spark's threshold form `levenshtein(l, r, maxDist)`
  * which abandons a row as soon as the running distance exceeds the
  * bound (O(maxDist·len) per pair instead of O(len²)).
  */
object Linkage {

  /** Two-ended block keys as array<struct<tag,key>>. The suffix key is a
    * right()-equivalent with the start clamped to 1: Spark's negative-pos
    * `substring(c, -n, n)` yields '' for strings shorter than n while SQL
    * `right(c, n)` returns the whole string — the clamp makes both
    * engines agree on short inputs.
    */
  def blockKeys(c: Column, blockLen: Int): Column = array(
    struct(lit("P").as("tag"), substring(c, 1, blockLen).as("key")),
    struct(lit("S").as("tag"),
      c.substr(greatest(length(c) - (blockLen - 1), lit(1)), lit(blockLen))
        .as("key")))

  /** (i, j, dist) pairs with levenshtein(leftKey, rightKey) ≤ maxDist.
    *
    * Completeness (ED ≤ 1): for strings of length ≥ 2·blockLen + 1 the
    * two-ended blocking guarantees any true pair shares a key. Shorter
    * strings can shift BOTH the prefix and the suffix block with one
    * edit, so the guard below ENFORCES the guarantee rather than
    * documenting it: since an ED ≤ 1 pair's lengths differ by at most 1,
    * every pair touching a sub-threshold string has both sides within
    * 2·blockLen + 1 chars — those subsets (bounded rows, ≤ 2·blockLen+1
    * bytes each) get an exact cross-match whose candidates union into
    * the blocked set, so short keys lose no recall and long keys pay
    * nothing. For maxDist > 1 the blocking is recall-bounded like any
    * LSH — keep the exact path as the audit oracle.
    */
  def fuzzyPairs(left: DataFrame, leftId: String, leftName: String,
                 right: DataFrame, rightId: String, rightName: String,
                 maxDist: Int, blockLen: Int = 6): DataFrame = {
    // build-side bound for the block-key join: 2 keys × (id + blockLen
    // chars + tag) per row ≈ the input's own (id, name) bytes — gate on
    // the pre-checkpoint estimates of both sides, ×2 safety because the
    // proxy understates when names are shorter than the two block keys
    val lBytes = graft.ops.Hints.estimatedBytes(
      left.select(col(leftId), col(leftName))) * 2
    val rBytes = graft.ops.Hints.estimatedBytes(
      right.select(col(rightId), col(rightName))) * 2
    val l = left.select(col(leftId).as("i"), col(leftName).as("li"))
      .localCheckpoint(eager = false)
    val r = right.select(col(rightId).as("j"), col(rightName).as("rj"))
      .localCheckpoint(eager = false)
    val lk = l.select(col("i"), explode(blockKeys(col("li"), blockLen)).as("b"))
      .select(col("i"), col("b.tag").as("tag"), col("b.key").as("key"))
    val rk = r.select(col("j"), explode(blockKeys(col("rj"), blockLen)).as("b"))
      .select(col("j"), col("b.tag").as("tag"), col("b.key").as("key"))
    val blocked = graft.ops.Hints.shuffleHashIfFits(lk, lBytes)
      .join(graft.ops.Hints.shuffleHashIfFits(rk, rBytes), Seq("tag", "key"))
      .select(col("i"), col("j"))
    // short-string completeness guard (see Scaladoc): exact cross-match
    // of the ≤ 2·blockLen+1-char subsets. Deliberate broadcast
    // nested-loop over rows of ≤ 13 bytes of key each — the short mass
    // is its own bound, never |left|×|right|.
    val maxShort = 2 * blockLen + 1
    val shortPairs = l.filter(length(col("li")) <= maxShort).select(col("i"))
      .crossJoin(broadcast(
        r.filter(length(col("rj")) <= maxShort).select(col("j"))))
    val cand = blocked.unionByName(shortPairs).distinct()
    cand.join(l, Seq("i")).join(r, Seq("j"))
      .select(col("i"), col("j"),
        levenshtein(col("li"), col("rj"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
