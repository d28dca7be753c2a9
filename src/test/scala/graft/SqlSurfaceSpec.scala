package graft

import org.apache.spark.sql.functions._

/** The SQL face of the engine: after Tables.registerAll, every capability
  * is reachable from plain `spark.sql` — views resolve, joins plan, and
  * the normalized events shape (ts timestamp + ts_ns long) is visible.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes every TESTDATA table to spark.sql") {
    Tables.registerAll(spark, dir)
    Tables.names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing")
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().nonEmpty, n)
    }
  }

  test("a SQL join over the views matches the DataFrame formulation") {
    Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect().toSeq
    val viaDf = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name").agg(count(lit(1)).as("n"))
      .orderBy($"n_name").collect().toSeq
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("events view carries the normalized ts + ts_ns columns (µs truncation)") {
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      "SELECT count(*) AS n FROM events WHERE ts_ns DIV 1000 = unix_micros(ts)")
      .as[Long].head()
    assert(r == spark.table("events").count())
  }
}
