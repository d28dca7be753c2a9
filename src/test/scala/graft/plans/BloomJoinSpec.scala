package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a shuffle join's build side
  * is selective but too large (or non-partition-keyed) for broadcast /
  * DPP, Catalyst can inject a bloom filter built from the filtered side
  * as a `might_contain` predicate on the probe side's SCAN — rows that
  * cannot join die before the exchange. At 100 TB this is the row-level
  * sibling of DPP (DppSpec): a selective dimension predicate prunes the
  * fact SHUFFLE even when the fact layout isn't partitioned on the key.
  * The thresholds below only lower the size floors so the optimizer
  * considers the tiny fixture; the rewrite itself is stock.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("probe-side scan gains a bloom might_contain filter from the filtered side") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    spark.range(100000)
      .select($"id", ($"id" % 5000).as("fk"), ($"id" * 7).as("v"))
      .write.mode("overwrite").parquet(s"$tmp/fact")
    spark.range(5000)
      .select($"id".as("dk"), ($"id" % 100).as("seg"))
      .write.mode("overwrite").parquet(s"$tmp/dim")

    val prev = (
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      // force a shuffle join (no broadcast ⇒ no broadcast-reuse path) and
      // drop the size floors to fixture scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")

      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").filter($"seg" === 3)
      val joined = fact.join(dim, fact("fk") === dim("dk"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom might_contain runtime filter in:\n$optimized")
      // 50 of 5000 dim keys survive seg=3; fact holds 20 rows per key
      assert(joined.count() == 1000L)
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.autoBroadcastJoinThreshold", prev._1)
      restore("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", prev._2)
      restore("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prev._3)
    }
  }
}
