package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (x even positions, y odd)") {
    val got = Seq((3L, 0L), (0L, 3L), (255L, 255L), (0L, 0L), (5L, 2L))
      .toDF("x", "y")
      .select(ZOrder.zvalue($"x", $"y", 8).as("z")).as[Long].collect().toSeq
    // x=0b101,y=0b010 -> z bits: x0@0=1, y0@1=0, x1@2=0, y1@3=1, x2@4=1 -> 0b11001
    assert(got == Seq(5L, 10L, 65535L, 0L, 25L))
  }

  test("z-order layout gives every partition a tight 2-D bounding box") {
    // full 64x64 grid; after range-partitioning the curve into 16 slices,
    // each slice's bounding box must be far smaller than the full grid in
    // the PRODUCT of both dimensions (single-column sort only bounds one)
    val grid = spark.range(64L * 64L).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val laid = ZOrder.layout(grid, $"x", $"y", bits = 6, numPartitions = 16)
    val boxes = laid
      .select($"x", $"y", $"z", spark_partition_id().as("pid"))
      .groupBy($"pid")
      .agg(min($"z").as("zlo"), max($"z").as("zhi"),
        (max($"x") - min($"x") + 1).as("wx"),
        (max($"y") - min($"y") + 1).as("wy"),
        count(lit(1)).as("n"))
    val rows = boxes.collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 4096L)
    // z ranges are disjoint across partitions (it IS range partitioning)
    val sorted = rows.sortBy(_.getAs[Long]("zlo"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("zhi") < b.getAs[Long]("zlo"))
      case _ =>
    }
    // every slice's box area is at most a quarter of the grid, and the
    // average is tighter still
    val areas = rows.map(r => r.getAs[Long]("wx") * r.getAs[Long]("wy"))
    assert(areas.max <= 64L * 64L / 4)
    assert(areas.sum.toDouble / areas.length < 64.0 * 64.0 / 8)
  }
}
