package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LevenshteinGuardSpec extends SparkSpec {
  import spark.implicits._

  // parquet round-trip: a literal LocalRelation would be constant-folded
  // into a pre-evaluated result before the rewrite is observable
  private lazy val rows = {
    graft.GraftExtensions.register(spark)  // installs the optimizer rule
    val dir = java.nio.file.Files.createTempDirectory("levguard").toString
    Seq(
      ("abcdef", "abcdef"),   // dist 0
      ("abcdef", "abcdxf"),   // dist 1
      ("abcdef", "abxdxf"),   // dist 2
      ("abcdef", "zzzzzzzzzz"), // length gap 4 → pre-guard prunes
      ("abcdef", null)        // NULL → out under both forms (filter context)
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("filter rewrite: thresholded form in the optimized plan, same rows out") {
    val plain = rows.filter(expr("levenshtein(a, b) <= 1"))
    val opt = plain.queryExecution.optimizedPlan.toString
    // the banded three-arg form replaced the full-DP two-arg comparison
    assert(opt.contains("Some(1)) >= 0"), opt)
    assert(opt.toLowerCase.contains("length"), opt)
    assert(plain.select($"b").as[String].collect().toSet ==
      Set("abcdef", "abcdxf"))
    // strict < re-thresholds at k-1
    assert(rows.filter(expr("levenshtein(a, b) < 2")).count() == 2)
    // reversed operand order matches too
    assert(rows.filter(expr("2 >= levenshtein(a, b)")).count() == 3)
  }

  test("rewrite is idempotent and leaves projections alone") {
    // projection keeps the plain form (NULL semantics differ there)
    val proj = rows.select(expr("levenshtein(a, b) <= 1").as("m"))
    val opt = proj.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Some(1)) >= 0"), opt)
    // NULL row yields NULL in projection — preserved
    assert(proj.filter($"m".isNull).count() == 1)
  }
}
