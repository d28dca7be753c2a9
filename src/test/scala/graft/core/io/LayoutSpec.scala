package graft.core.io

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def table() = {
    val dir = Files.createTempDirectory("layout").toString
    val df = (0 until 1000).map(i =>
      (i.toLong, s"t${i % 4}", i % 10, s"payload$i")).toDF("id", "etype", "day", "v")
    Layout.writePartitioned(df, dir, Seq("etype", "day"))
    dir
  }

  test("partition filters prune at plan time — non-matching files never scanned") {
    val dir = table()
    val q = Layout.readTable(spark, dir)
      .filter($"etype" === "t1" && $"day" === 3 && $"id" > 10)
    val physical = q.queryExecution.executedPlan.toString
    // the partition predicate must land in PartitionFilters, not a
    // post-scan Filter; the data predicate stays a pushed filter
    assert(physical.contains("PartitionFilters"), physical.take(400))
    assert("""PartitionFilters: \[[^\]]*etype""".r.findFirstIn(physical).isDefined,
      "etype filter not applied at the file index")
    // behavioral proof of pruning: corrupt every file of a NON-matching
    // partition — the pruned read must still succeed (it never opens
    // them), while an unpruned full scan must fail on the garbage
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir, "etype=t2")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .foreach(p => Files.write(p, "not a parquet file".getBytes))
    assert(q.count() == (0 until 1000)
      .count(i => i % 4 == 1 && i % 10 == 3 && i > 10))
    assertThrows[Exception] {
      Layout.readTable(spark, dir).filter($"id" >= 0).count()
    }
  }

  test("partition columns round-trip values and the layout is directory-per-value") {
    val dir = table()
    val back = Layout.readTable(spark, dir)
    assert(back.count() == 1000)
    assert(back.select(countDistinct($"etype")).as[Long].head() == 4)
    // every file path encodes both partition values
    assert(back.inputFiles.forall(f => f.contains("etype=") && f.contains("day=")))
  }

  test("ORC / CSV / JSON round-trip the same rows as parquet") {
    val df = (0 until 500).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "s", "x")
    val base = Files.createTempDirectory("fmt").toString
    df.write.orc(s"$base/orc")
    df.write.option("header", "true").csv(s"$base/csv")
    df.write.json(s"$base/json")
    val orc = spark.read.orc(s"$base/orc")
    val csv = spark.read.option("header", "true")
      .schema("id LONG, s STRING, x DOUBLE").csv(s"$base/csv")
    val json = spark.read.schema("id LONG, s STRING, x DOUBLE").json(s"$base/json")
    val want = df.orderBy($"id").collect().toSeq
    Seq("orc" -> orc, "csv" -> csv, "json" -> json).foreach { case (n, got) =>
      assert(got.select($"id", $"s", $"x").orderBy($"id").collect().toSeq == want,
        s"$n round-trip diverged")
    }
  }
}
