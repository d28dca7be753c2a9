package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder: every graft entry point (Verify, Bench,
  * demos, user code) needs the same base configuration — UTC, AQE,
  * shuffle partitions sized to the machine, the TIMESTAMP(NANOS) legacy
  * read for `events.parquet`, µs parquet output for oracle parity.
  */
object Sessions {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  /** Local session sized to N cores, with graft's SQL functions registered. */
  def local(cores: Int): SparkSession = {
    val spark = builder(s"local[$cores]", cores).getOrCreate()
    GraftExtensions.register(spark)
    spark
  }
}
