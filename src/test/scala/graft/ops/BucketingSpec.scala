package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // force SMJ so the comparison is shuffle-vs-bucketed, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

      // unbucketed baseline: the join must shuffle both sides
      val plain = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      assert(Bucketing.hasShuffle(plain))

      // bucket both sides by the join key once at write time
      Bucketing.writeBucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"), "orders_b", "orderkey", 8)
      Bucketing.writeBucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"), "lineitem_b", "orderkey", 8)
      val bucketed = Bucketing.bucketedJoin(spark, "lineitem_b", "orders_b", "orderkey")
      assert(!Bucketing.hasShuffle(bucketed))

      // same row count either way
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
