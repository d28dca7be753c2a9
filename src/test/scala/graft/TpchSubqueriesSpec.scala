package graft

import graft.queries.TpchSubqueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cross-checks for the subquery-shaped TPC-H adaptations: each query's
  * defining trick (correlated min, scalar threshold, semi/anti chain) is
  * re-derived here with an independent formulation. The DuckDB oracle
  * covers values end-to-end; these pin the *semantics* so a refactor
  * can't silently change the shape.
  */
class TpchSubqueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = TpchSubqueries.defs(name).fn(spark, dir)

  test("q2: every returned row carries its part's regional minimum cost") {
    val rows = q("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    // re-derive min cost per part over the same region via a window
    val l = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
        .cast("long")).as("cost_c"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val minPerPart = l.groupBy(col("l_partkey"))
      .agg(min(col("cost_c")).as("true_min"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("cost_c") == minPerPart(pk),
        s"part $pk row cost != regional min")
    }
  }

  test("q15: result is exactly the argmax supplier(s) of the revenue view") {
    val got = q("q15_top_supplier").collect()
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast("long")).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxRev = revenue.values.max
    val expect = revenue.filter(_._2 == maxRev).keySet
    assert(got.map(_.getAs[Long]("s_suppkey")).toSet == expect)
    assert(got.forall(_.getAs[Long]("total_revenue_c") == maxRev))
  }

  test("q21: semi/anti chain equals the window-count formulation") {
    val got = q("q21_waiting_orders").collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    // windows over (orderkey): distinct suppliers and distinct late suppliers
    val l = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("int"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = l
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("late") === 1, col("l_suppkey"))).over(w)))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late_supp") === 1)
    val expect = flagged
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(25)
      .collect().map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    assert(got == expect)
  }

  test("q11/q16/q20 thresholds: integer cross-multiplication, non-empty, bounded") {
    val q11 = q("q11_important_stock").collect()
    assert(q11.nonEmpty && q11.length <= 50)
    val q16 = q("q16_supplier_part_count").collect()
    assert(q16.nonEmpty)
    // exclusion really removed below-average-balance suppliers from counts:
    // every group count must be <= the retained supplier population
    val bal = Tables.supplier(spark, dir)
      .select(floor(col("s_acctbal") * 100 + 0.5).cast("long").as("bal_c"))
      .collect().map(_.getLong(0))
    val retained = bal.count(b => b * bal.length >= bal.sum)
    assert(q16.forall(_.getAs[Long]("supplier_cnt") <= retained))
    val q20 = q("q20_volume_suppliers").collect()
    assert(q20.nonEmpty)
  }
}
