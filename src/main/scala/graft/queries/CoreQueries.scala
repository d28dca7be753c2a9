package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-shaped analytical queries over the TESTDATA star schema.
  *
  * Money/quantity aggregates accumulate in integer cents
  * (`floor(x*100 + 0.5)::long`) so Spark and the DuckDB oracle agree bit-exactly
  * regardless of floating-point summation order; derived doubles are then
  * computed from the exact integer sums (deterministic division).
  */
object CoreQueries {

  /** Exact integer-cents sum of a double column (floor(x·100+0.5): the
    * binary-double rounding both engines compute identically — engine
    * round() can disagree on representation-boundary values).
    */
  private def centsSum(c: Column): Column = sum(floor(c * 100 + 0.5).cast("long"))
  private def cents(alias: String): String =
    s"CAST(sum(CAST(floor($alias*100 + 0.5) AS BIGINT)) AS BIGINT)"

  val defs: Map[String, QueryDef] = Map(

    // ── Q1: pricing summary (scan + filter pushdown + hash aggregate) ──
    "q1_pricing_summary" -> QueryDef(
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            centsSum(col("l_quantity")).as("sum_qty_c"),
            centsSum(col("l_extendedprice")).as("sum_base_price_c"),
            centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price_c"),
            centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge_c"),
            count(lit(1)).as("count_order"))
          // binary-double rounding: engine round() can disagree on
          // representation-boundary ratios (see TextAnalysis.round4)
          .withColumn("avg_qty",
            floor(col("sum_qty_c") / 100.0 / col("count_order") * 100.0 + 0.5) / 100.0)
          .withColumn("avg_price",
            floor(col("sum_base_price_c") / 100.0 / col("count_order") * 100.0 + 0.5) / 100.0)
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  ${cents("l_quantity")} AS sum_qty_c,
         |  ${cents("l_extendedprice")} AS sum_base_price_c,
         |  ${cents("l_extendedprice*(1-l_discount)")} AS sum_disc_price_c,
         |  ${cents("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge_c,
         |  count(*) AS count_order,
         |  floor(${cents("l_quantity")}/100.0/count(*) * 100.0 + 0.5) / 100.0 AS avg_qty,
         |  floor(${cents("l_extendedprice")}/100.0/count(*) * 100.0 + 0.5) / 100.0 AS avg_price
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ── Q3: shipping priority (3-way join + agg + top-k) ──
    "q3_shipping_priority" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val l = Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("l_orderkey"))
          .limit(10)
      },
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  o_orderpriority,
         |  ${cents("l_extendedprice*(1-l_discount)")} AS revenue_c
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_c DESC, l_orderkey
         |LIMIT 10""".stripMargin),

    // ── Q5: local supplier volume (6-way join incl. two broadcast dims) ──
    "q5_local_supplier" -> QueryDef(
      (spark, dir) => {
        val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(spark, dir)
        val c = Tables.customer(spark, dir)
        val s = Tables.supplier(spark, dir)
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(spark, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(s, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("n_name"))
      },
      s"""SELECT n_name, ${cents("l_extendedprice*(1-l_discount)")} AS revenue_c
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue_c DESC, n_name""".stripMargin),

    // ── Q6: revenue forecast (tight filter → single-row agg; pushdown demo) ──
    "q6_forecast_revenue" -> QueryDef(
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(centsSum(col("l_extendedprice") * col("l_discount")).as("revenue_c"),
            count(lit(1)).as("n")),
      s"""SELECT ${cents("l_extendedprice*l_discount")} AS revenue_c, count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin),

    // ── distinct aggregates ──
    "q_distinct_parts" -> QueryDef(
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ── window: top-3 orders per customer (row_number) ──
    "q_window_top_orders" -> QueryDef(
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(spark, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("totalprice_c"),
            col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_c, CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin),

    // ── window function breadth: lag/lead/ntile/first/last in one pass ──
    "q_window_shapes" -> QueryDef(
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(spark, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"),
            lead(col("o_orderkey"), 1).over(w).as("next_order"),
            ntile(4).over(w).as("quartile"),
            first(col("o_orderkey")).over(wFull).as("first_order"),
            last(col("o_orderkey")).over(wFull).as("last_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ── ordered collect: sorted event-type list per user ──
    "ev_collect_sorted" -> QueryDef(
      (spark, dir) =>
        Tables.events(spark, dir)
          .groupBy(col("user_id"))
          .agg(array_join(sort_array(collect_list(col("event_type"))), ",").as("types"))
          .orderBy(col("user_id")),
      """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ── window frame: per-customer running total (rows unbounded-preceding) ──
    "q_running_total" -> QueryDef(
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(spark, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).over(w).as("running_c"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  )
}
