package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Additional TPC-H-shaped benchmark queries: LIKE/IN predicates,
  * conditional aggregation over joins, OR-of-ANDs pushdown, top-k over a
  * 4-way join — rounding out the analytical shapes a user expects.
  */
object MoreTpchQueries {

  private def cents(alias: String): String =
    s"CAST(sum(CAST(floor($alias*100 + 0.5) AS BIGINT)) AS BIGINT)"

  val defs: Map[String, QueryDef] = Map(

    // ── q10 shape: top customers by returned-item revenue (4-way join + top-k) ──
    "q10_returned_items" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
        val n = Tables.nation(spark, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("c_custkey"))
          .limit(20)
      },
      s"""SELECT c_custkey, c_name, n_name,
         |  ${cents("l_extendedprice*(1-l_discount)")} AS revenue_c
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin),

    // ── q12 shape: IN-list filter + conditional aggregation over a join ──
    "q12_priority_class" -> QueryDef(
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
        val l = Tables.lineitem(spark, dir)
          .filter(col("l_linestatus").isin("F", "O") &&
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      """SELECT l_linestatus,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_linestatus IN ('F', 'O')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // ── q14 shape: promo revenue share (LIKE-prefix + ratio of exact sums) ──
    "q14_promo_share" -> QueryDef(
      (spark, dir) => {
        val p = Tables.part(spark, dir)
        val l = Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type").startsWith("PROMO"),
              floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
                .cast("long")).otherwise(0L)).as("promo_c"),
            sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
              .cast("long")).as("total_c"))
          .select(col("promo_c"), col("total_c"),
            (floor(col("promo_c") * 100.0 / col("total_c") * 10000.0 + 0.5) / 10000.0).as("promo_pct"))
      },
      """WITH s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS promo_c,
        |    CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT promo_c, total_c,
        |  floor(promo_c * 100.0 / total_c * 10000.0 + 0.5) / 10000.0 AS promo_pct
        |FROM s""".stripMargin),

    // ── q7 shape: bilateral nation volume (OR of symmetric pairs + year) ──
    "q7_nation_volume" -> QueryDef(
      (spark, dir) => {
        val n1 = Tables.nation(spark, dir)
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(spark, dir)
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        val pair = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
        Tables.lineitem(spark, dir)
          .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .filter(pair)
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_c"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  ${cents("l_extendedprice*(1-l_discount)")} AS revenue_c
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // ── q8 shape: market share — conditional revenue ratio per year ──
    "q8_market_share" -> QueryDef(
      (spark, dir) => {
        val n = Tables.nation(spark, dir)
        Tables.lineitem(spark, dir)
          .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("n_name") === "NATION_1",
              floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
                .cast("long")).otherwise(0L)).as("nation_c"),
            sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
              .cast("long")).as("total_c"))
          .select(col("o_year"), col("nation_c"), col("total_c"),
            (floor(col("nation_c") * 10000.0 / col("total_c") * 10000.0 + 0.5) / 10000.0).as("share_bp"))
          .orderBy(col("o_year"))
      },
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN n_name = 'NATION_1'
        |    THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS nation_c,
        |  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  floor(CAST(sum(CASE WHEN n_name = 'NATION_1'
        |      THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) * 10000.0
        |    / CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)
        |    * 10000.0 + 0.5) / 10000.0 AS share_bp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin),

    // ── q22 shape: substring buckets + avg scalar subquery + anti join ──
    "q22_global_sales_opportunity" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
          .withColumn("segcode", substring(col("c_mktsegment"), 1, 2))
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("ab"))
        val recentOrders = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("ab") &&
            col("segcode").isin("BU", "MA", "AU"))
          .join(recentOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("segcode"))
          .agg(count(lit(1)).as("numcust"),
            sum(floor(col("c_acctbal") * 100 + 0.5).cast("long")).as("totacctbal_c"))
          .orderBy(col("segcode"))
      },
      """SELECT substr(c_mktsegment, 1, 2) AS segcode, count(*) AS numcust,
        |  CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_c
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND substr(c_mktsegment, 1, 2) IN ('BU', 'MA', 'AU')
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY segcode""".stripMargin),

    // ── q18 shape: HAVING filter on an aggregated subquery gating a join ──
    "q18_large_orders" -> QueryDef(
      (spark, dir) => {
        val l = Tables.lineitem(spark, dir)
        val o = Tables.orders(spark, dir)
        val big = l.groupBy(col("l_orderkey"))
          .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty_c"))
          .filter(col("qty_c") > 15000)   // > 150 units
        o.join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("totalprice_c"),
            col("qty_c"))
          .orderBy(col("qty_c").desc, col("o_orderkey"))
          .limit(25)
      },
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_c, qty_c
        |FROM orders JOIN (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) > 15000) b
        |  ON o_orderkey = b.l_orderkey
        |ORDER BY qty_c DESC, o_orderkey LIMIT 25""".stripMargin),

    // ── q13 shape: left-outer join histogram (customers by order count,
    //    zero bucket included) ──
    "q13_order_distribution" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val o = Tables.orders(spark, dir)
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // ── q19 shape: OR-of-ANDs predicate (brand/size/quantity bands) ──
    "q19_disjunctive_filter" -> QueryDef(
      (spark, dir) => {
        val p = Tables.part(spark, dir)
        val l = Tables.lineitem(spark, dir)
        val cond =
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_c"),
            count(lit(1)).as("n"))
      },
      s"""SELECT ${cents("l_extendedprice*(1-l_discount)")} AS revenue_c, count(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  )
}
