package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("plan packs files in path order per directory; groups respect the target modulo one tail") {
    val files = Seq(
      ("/t/a/part-00.parquet", 40L), ("/t/a/part-01.parquet", 40L),
      ("/t/a/part-02.parquet", 40L), ("/t/a/part-03.parquet", 10L),
      ("/t/b/part-00.parquet", 500L), // oversize file: its own group space
      ("/t/b/part-01.parquet", 20L)
    ).toDF("path", "bytes")
    val p = Compaction.plan(files, "path", "bytes", targetBytes = 100L)
      .orderBy($"dir", $"path")
      .as[(String, String, Long, Long)].collect().toSeq
    // dir a: offsets 0,40,80,120 → groups 0,0,0,1
    assert(p.filter(_._1 == "/t/a").map(_._4) == Seq(0L, 0L, 0L, 1L))
    // dir b: offsets 0,500 → groups 0,5 (grouping never crosses dirs)
    assert(p.filter(_._1 == "/t/b").map(_._4) == Seq(0L, 5L))

    val stats = Compaction.groupStats(
        Compaction.plan(files, "path", "bytes", 100L))
      .orderBy($"dir", $"grp")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(stats == Seq(
      ("/t/a", 0L, 3L, 120L), ("/t/a", 1L, 1L, 10L),
      ("/t/b", 0L, 1L, 500L), ("/t/b", 5L, 1L, 20L)))
    // deterministic: same listing, same plan, any partitioning
    val again = Compaction.plan(files.repartition(5), "path", "bytes", 100L)
      .orderBy($"dir", $"path")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(again == p)
  }
}
