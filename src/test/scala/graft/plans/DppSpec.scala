package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: the lakehouse layout contract — a fact
  * table partitioned on a join key reads ONLY the partitions that
  * survive a selective dimension filter, with the pruning predicate
  * injected at runtime from the broadcast side. This is the scan-level
  * behavior the engine's partitioned writers (ev_zorder_layout,
  * Compaction) are shaped for; at 100 TB it is the difference between
  * scanning one date/tenant slice and scanning the corpus.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("fact scan carries a dynamicpruning partition filter from the dim side") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.range(10000)
      .select($"id", ($"id" % 20).as("pk"), ($"id" * 3).as("v"))
      .write.partitionBy("pk").mode("overwrite").parquet(s"$tmp/fact")
    spark.range(20)
      .select($"id".as("dk"), concat(lit("n"), $"id").as("name"))
      .write.mode("overwrite").parquet(s"$tmp/dim")

    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter($"name" === "n3")
    val joined = fact.join(dim, fact("pk") === dim("dk"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
    // one of 20 partitions survives: 10000/20 rows
    assert(joined.count() == 500L)
  }
}
