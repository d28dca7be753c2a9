package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The driver has shipped `events.ts` as TIMESTAMP(NANOS) (read as a
  * LONG under nanosAsLong) and as TIMESTAMP(MICROS)/NTZ across testdata
  * regenerations — `Tables.events` must normalize BOTH to the same
  * (ts timestamp, ts_ns long) shape, µs-exact.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(1660000000000000L, 1660000123456789L)

  test("events loader: nanos-long encoding → (ts, ts_ns)") {
    val dir = Files.createTempDirectory("evlong")
    micros.map(us => (1L, us * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir.toString)
      .select(unix_micros($"ts"), $"ts_ns").as[(Long, Long)].collect().toSet
    assert(got == micros.map(us => (us, us * 1000L)).toSet)
  }

  test("events loader: TIMESTAMP_NTZ encoding → identical (ts, ts_ns)") {
    val dir = Files.createTempDirectory("evntz")
    micros.map(us => (1L, us)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir.toString)
      .select(unix_micros($"ts"), $"ts_ns").as[(Long, Long)].collect().toSet
    assert(got == micros.map(us => (us, us * 1000L)).toSet)
  }
}
