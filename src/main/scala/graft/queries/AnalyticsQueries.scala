package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Broader analytical surface over the star schema: semi/anti joins,
  * rollup grouping, scalar and correlated subquery shapes — the Spark
  * built-ins a user of the engine gets beyond the reference's own operator
  * set (SURVEY §2.5 note: the TESTDATA schema exercises them).
  */
object AnalyticsQueries {

  private def cents(alias: String): String =
    s"CAST(sum(CAST(floor($alias*100 + 0.5) AS BIGINT)) AS BIGINT)"

  val defs: Map[String, QueryDef] = Map(

    // ── semi join: orders with at least one late lineitem (EXISTS) ──
    "q4_order_priority" -> QueryDef(
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        val l = Tables.lineitem(spark, dir)
          .filter(col("l_linenumber") >= 3)
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_linenumber >= 3)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ── full co-moment matrix in ONE map-combined pass: exact integer
    //    sufficient statistics (n, Σx, Σy, Σxy) for every measure pair —
    //    the distributable core of covariance/correlation at 100 TB (the
    //    closing divisions are driver-side scalars). Measures coarsened
    //    to integer units (dollars / percent points) so every sum stays
    //    exact in 64 bits on any partitioning ──
    "stats_cov_pairs" -> QueryDef(
      (spark, dir) => {
        val cols = Seq("disc", "price", "qty", "tax")
        val li = Tables.lineitem(spark, dir).select(
          floor(col("l_quantity") + 0.5).cast("long").as("qty"),
          floor(col("l_extendedprice")).cast("long").as("price"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("disc"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("tax"))
        val pairs = for { i <- cols.indices; j <- i until cols.length }
          yield (cols(i), cols(j))
        val aggs = Seq(count(lit(1)).as("n")) ++
          cols.map(c => sum(col(c)).as(s"s_$c")) ++
          pairs.map { case (x, y) => sum(col(x) * col(y)).as(s"s_${x}_$y") }
        val structs = pairs.map { case (x, y) =>
          s"struct('$x' AS xcol, '$y' AS ycol, n, s_$x AS sx, s_$y AS sy, s_${x}_$y AS sxy)"
        }.mkString(", ")
        li.agg(aggs.head, aggs.tail: _*)
          .select(explode(expr(s"array($structs)")).as("p"))
          .select(col("p.*"))
          .orderBy(col("xcol"), col("ycol"))
      }, {
        val cols = Seq("disc", "price", "qty", "tax")
        val pairs = for { i <- cols.indices; j <- i until cols.length }
          yield (cols(i), cols(j))
        val moments = (cols.map(c => s"CAST(sum($c) AS BIGINT) AS s_$c") ++
          pairs.map { case (x, y) =>
            s"CAST(sum($x * $y) AS BIGINT) AS s_${x}_$y" }).mkString(", ")
        val rows = pairs.map { case (x, y) =>
          s"SELECT '$x' AS xcol, '$y' AS ycol, n, s_$x AS sx, s_$y AS sy, " +
            s"s_${x}_$y AS sxy FROM st" }.mkString(" UNION ALL ")
        s"""WITH v AS (SELECT
           |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
           |    CAST(floor(l_extendedprice) AS BIGINT) AS price,
           |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
           |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax
           |  FROM lineitem),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n, $moments FROM v)
           |$rows ORDER BY xcol, ycol""".stripMargin
      }),

    // ── join-key skew diagnostic: per-key frequency profile of the
    //    orderkey join column — max/p99/mean key mass and the top key's
    //    share decide salting vs AQE skew-join BEFORE the join runs.
    //    p99 from the exact count histogram (two tiny aggregations past
    //    the one key-grain count) ──
    // ── zone-map data-skipping audit: per-shard min/max "footer stats"
    //    under TWO physical layouts of the same rows — key-clustered
    //    shards (l_orderkey DIV 500: every shard spans the full date
    //    range) vs time-partitioned shards (year*100+month of l_shipdate:
    //    the ingest-order layout). A 3-month predicate then consults ONLY
    //    the zone maps to decide scan-vs-skip per shard, and the audit
    //    proves pruning is lossless: rows matched inside scanned shards
    //    == rows matched by the full scan. This is the file-skipping
    //    planner a 100 TB table lives or dies by — the zone-map frame is
    //    shard-grain (kilobytes), the decision join is a broadcast, and
    //    the result quantifies WHY layout choice matters: the key layout
    //    skips 0 shards, the time layout skips all but the 3-4 the
    //    predicate touches. No global sort anywhere: both shard keys are
    //    pure row-local expressions, stats are one map-combined agg. ──
    "q_zonemap_skip" -> QueryDef(
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir).select(
          col("l_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("t"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"))
        val lo = unix_micros(lit("1997-06-01").cast("timestamp"))
        val hi = unix_micros(lit("1997-09-01").cast("timestamp"))
        def audit(layout: String, shard: org.apache.spark.sql.Column) = {
          val rows = li.select(shard.cast("long").as("shard"), col("t"))
          val zones = rows.groupBy(col("shard")).agg(
            min(col("t")).as("zmin"), max(col("t")).as("zmax"),
            count(lit(1)).as("n_rows"))
            .withColumn("scan", !(col("zmax") < lo || col("zmin") >= hi))
          val pruned = rows
            .join(broadcast(zones.filter(col("scan"))
              .select(col("shard").as("s2"))), col("shard") === col("s2"))
            .agg(count(lit(1)).as("rows_scanned"),
              sum(when(col("t") >= lo && col("t") < hi, 1L).otherwise(0L))
                .as("rows_matched_pruned"))
          val full = li.agg(
            count(lit(1)).as("rows_total"),
            sum(when(col("t") >= lo && col("t") < hi, 1L).otherwise(0L))
              .as("rows_matched_full"))
          zones.agg(
            count(lit(1)).as("n_shards"),
            sum(when(col("scan"), 1L).otherwise(0L)).as("n_scan"),
            sum(when(!col("scan"), 1L).otherwise(0L)).as("n_skip"))
            .crossJoin(pruned).crossJoin(full)
            .select(lit(layout).as("layout"), col("n_shards"), col("n_scan"),
              col("n_skip"), col("rows_total"), col("rows_scanned"),
              col("rows_matched_pruned"), col("rows_matched_full"),
              (col("rows_matched_pruned") === col("rows_matched_full"))
                .as("lossless"))
        }
        audit("key", expr("l_orderkey DIV 500"))
          .unionByName(audit("time", col("ym")))
          .orderBy(col("layout"))
      },
      """WITH li AS (SELECT l_orderkey, epoch_us(l_shipdate) AS t FROM lineitem),
        |b AS (SELECT epoch_us(TIMESTAMP '1997-06-01') AS lo,
        |             epoch_us(TIMESTAMP '1997-09-01') AS hi),
        |r AS (SELECT 'key' AS layout, l_orderkey // 500 AS shard,
        |        epoch_us(l_shipdate) AS t FROM lineitem
        |      UNION ALL
        |      SELECT 'time', year(l_shipdate) * 100 + month(l_shipdate),
        |        epoch_us(l_shipdate) FROM lineitem),
        |z AS (SELECT layout, shard, min(t) AS zmin, max(t) AS zmax,
        |        count(*) AS n_rows FROM r GROUP BY 1, 2),
        |zs AS (SELECT z.*, NOT (zmax < lo OR zmin >= hi) AS scan FROM z, b),
        |shards AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_shards,
        |    CAST(sum(CASE WHEN scan THEN 1 ELSE 0 END) AS BIGINT) AS n_scan,
        |    CAST(sum(CASE WHEN scan THEN 0 ELSE 1 END) AS BIGINT) AS n_skip
        |  FROM zs GROUP BY 1),
        |pruned AS (SELECT r.layout, CAST(count(*) AS BIGINT) AS rows_scanned,
        |    CAST(sum(CASE WHEN r.t >= b.lo AND r.t < b.hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rows_matched_pruned
        |  FROM r JOIN zs ON r.layout = zs.layout AND r.shard = zs.shard, b
        |  WHERE zs.scan GROUP BY 1),
        |fl AS (SELECT CAST(count(*) AS BIGINT) AS rows_total,
        |    CAST(sum(CASE WHEN t >= lo AND t < hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rows_matched_full FROM li, b)
        |SELECT s.layout, s.n_shards, s.n_scan, s.n_skip, f.rows_total,
        |  p.rows_scanned, p.rows_matched_pruned, f.rows_matched_full,
        |  p.rows_matched_pruned = f.rows_matched_full AS lossless
        |FROM shards s JOIN pruned p ON s.layout = p.layout, fl f
        |ORDER BY s.layout""".stripMargin),

    "q_skew_metrics" -> QueryDef(
      (spark, dir) => {
        val k = Tables.lineitem(spark, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("f"))
          .localCheckpoint(eager = false)
        val hist = k.groupBy(col("f")).agg(count(lit(1)).as("nk"))
        val tot = k.agg(count(lit(1)).as("n_keys"), sum(col("f")).as("n_rows"),
          max(col("f")).as("max_f"))
        import org.apache.spark.sql.expressions.Window
        val cum = hist.withColumn("cum",
          sum(col("nk")).over(Window.orderBy(col("f"))))
        val p99 = cum.crossJoin(broadcast(tot))
          .filter(col("cum") * 100 >= col("n_keys") * 99)
          .agg(min(col("f")).as("p99_f"))
        tot.crossJoin(broadcast(p99))
          .select(col("n_keys"), col("n_rows"), col("max_f"), col("p99_f"),
            expr("(max_f * 1000000) DIV GREATEST(n_rows, 1)").as("top_share_ppm"),
            expr("(n_rows * 100) DIV n_keys").as("mean_f_x100"))
      },
      """WITH k AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS f
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT f, CAST(count(*) AS BIGINT) AS nk FROM k GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(f) AS BIGINT) AS n_rows, max(f) AS max_f FROM k),
        |c AS (SELECT f, CAST(sum(nk) OVER (ORDER BY f) AS BIGINT) AS cum FROM h),
        |p AS (SELECT min(f) AS p99_f FROM c CROSS JOIN t
        |      WHERE cum * 100 >= n_keys * 99)
        |SELECT n_keys, n_rows, max_f, p99_f,
        |  (max_f * 1000000) // GREATEST(n_rows, 1) AS top_share_ppm,
        |  (n_rows * 100) // n_keys AS mean_f_x100
        |FROM t CROSS JOIN p""".stripMargin),

    // ── MERGE/upsert (SCD1): base ⟕⟖ updates full-outer on the key —
    //    update wins when matched, insert when new, base row carried
    //    otherwise; per-row action tagged and audited. The one-shuffle
    //    batch equivalent of MERGE INTO at the key grain ──
    "q_merge_upsert" -> QueryDef(
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
        val base = o.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
          .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pr"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_c"))
        val upd = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
          .select(col("o_orderkey").as("k2"), col("o_orderpriority").as("pr2"),
            expr("(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 11) DIV 10")
              .as("price_c2"))
        base.join(upd, col("k") === col("k2"), "full_outer")
          .select(coalesce(col("pr2"), col("pr")).as("o_orderpriority"),
            coalesce(col("price_c2"), col("price_c")).as("price_c"),
            when(col("k").isNull, "insert")
              .when(col("k2").isNull, "keep").otherwise("update").as("action"))
          .groupBy(col("o_orderpriority"), col("action"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("total_c"))
          .orderBy(col("o_orderpriority"), col("action"))
      },
      """WITH base AS (SELECT o_orderkey AS k, o_orderpriority AS pr,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |upd AS (SELECT o_orderkey AS k2, o_orderpriority AS pr2,
        |    (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 11) // 10
        |      AS price_c2
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |m AS (SELECT coalesce(pr2, pr) AS o_orderpriority,
        |    coalesce(price_c2, price_c) AS price_c,
        |    CASE WHEN k IS NULL THEN 'insert'
        |         WHEN k2 IS NULL THEN 'keep' ELSE 'update' END AS action
        |  FROM base FULL OUTER JOIN upd ON k = k2)
        |SELECT o_orderpriority, action, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(price_c) AS BIGINT) AS total_c
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ── data profiling: per-column (rows, nulls, distinct, min, max) for
    //    a table in ONE pass — the ingest-audit primitive. All five stats
    //    are map-combinable aggregates; the per-column unpivot happens on
    //    the single result row. At 100 TB swap count(distinct) for the
    //    Hll sketch (same shuffle shape, 256-row ceiling per column) ──
    "q_profile_table" -> QueryDef(
      (spark, dir) => {
        val cols = Seq("l_quantity", "l_discount", "l_linestatus", "l_returnflag")
        val li = Tables.lineitem(spark, dir)
        // rows/nulls/min/max in one map-combined pass; distinct counts at
        // the exploded (column, value) grain — a 4-countDistinct single
        // agg forces an Expand (4× the rows through one shuffle), while
        // the (cn, v) distinct map-combines per column: measured 4.0 s →
        // 1.5 s warm at sf0.1. String rendering is injective per column,
        // and NULLs are filtered to keep count(DISTINCT) semantics.
        val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
            min(col(c).cast("string")).as(s"min_$c"),
            max(col(c).cast("string")).as(s"max_$c"))
        }
        val base = li.agg(aggs.head, aggs.tail: _*)
        val pairs = cols.map(c =>
          s"struct('$c' AS cn, CAST($c AS STRING) AS v)").mkString(", ")
        val nd = li.select(explode(expr(s"array($pairs)")).as("p"))
          .select(col("p.cn").as("col_name"), col("p.v").as("v"))
          .filter(col("v").isNotNull).distinct()
          .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
        def pick(stat: String) = expr(cols
          .map(c => s"WHEN '$c' THEN ${stat}_$c")
          .mkString("CASE col_name ", " ", " END"))
        nd.crossJoin(broadcast(base))
          .select(col("col_name"), col("n_rows"), pick("nulls").as("n_nulls"),
            col("n_distinct"), pick("min").as("min_s"), pick("max").as("max_s"))
          .orderBy(col("col_name"))
      }, {
        val cols = Seq("l_quantity", "l_discount", "l_linestatus", "l_returnflag")
        val rows = cols.map { c =>
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  min(CAST($c AS VARCHAR)) AS min_s,
             |  max(CAST($c AS VARCHAR)) AS max_s
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"$rows\nORDER BY col_name"
      }),

    // ── SCD2 interval construction: each per-user event's value is valid
    //    [ts, next-event ts) — ONE lead() window partitioned by user (no
    //    global sort; a user's history sorts within its partition), open
    //    intervals keep valid_to NULL ──
    "ev_scd2_intervals" -> QueryDef(
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.events(spark, dir)
          .filter(pmod(col("user_id"), lit(50)) === 0)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts_ns DIV 1000").as("valid_from"))
          .withColumn("valid_to",
            lead(col("valid_from"), 1).over(
              Window.partitionBy(col("user_id"))
                .orderBy(col("valid_from"), col("event_id"))))
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS valid_to
        |FROM events WHERE user_id % 50 = 0
        |ORDER BY user_id, valid_from, event_id""".stripMargin),

    // ── anti join: customers with no orders (NOT EXISTS) ──
    "q_customers_without_orders" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val o = Tables.orders(spark, dir)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // ── rollup: revenue by (returnflag, linestatus) with subtotals;
    //    sentinel 'ALL' instead of NULL so the hash compare is unambiguous ──
    "q_rollup_revenue" -> QueryDef(
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_c"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("rev_c"))
          .orderBy(col("rf"), col("ls")),
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin),

    // ── full outer join with matched/only-left/only-right classification ──
    "q_full_outer_reconcile" -> QueryDef(
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
          .filter(pmod(col("c_custkey"), lit(3)) =!= 0)
          .select(col("c_custkey").as("ckey"), col("c_mktsegment"))
        val o = Tables.orders(spark, dir)
          .filter(pmod(col("o_custkey"), lit(2)) === 0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        c.join(o, col("ckey") === col("o_custkey"), "full_outer")
          .select(when(col("ckey").isNotNull && col("o_custkey").isNotNull, "matched")
            .when(col("ckey").isNotNull, "customer_only")
            .otherwise("orders_only").as("side"))
          .groupBy(col("side")).agg(count(lit(1)).as("n"))
          .orderBy(col("side"))
      },
      """SELECT CASE WHEN ckey IS NOT NULL AND o_custkey IS NOT NULL THEN 'matched'
        |            WHEN ckey IS NOT NULL THEN 'customer_only'
        |            ELSE 'orders_only' END AS side, count(*) AS n
        |FROM (SELECT c_custkey AS ckey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
        |                 WHERE o_custkey % 2 = 0 GROUP BY o_custkey) o
        |  ON ckey = o_custkey
        |GROUP BY 1 ORDER BY side""".stripMargin),

    // ── keyed snapshot diff (data-versioning audit): synthesize a "next"
    //    snapshot from documents (drop %97, edit %31, insert %101 under
    //    shifted ids), full-outer join on the key comparing content
    //    hashes → added / removed / changed / unchanged tallies. At scale
    //    this is one co-partitioned key join; hashes ride the scans ──
    "q_snapshot_diff" -> QueryDef(
      (spark, dir) => {
        val cur = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        val nxt = cur.filter(pmod(col("doc_id"), lit(97)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(31)) === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(cur.filter(pmod(col("doc_id"), lit(101)) === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(lit("new "), col("text")).as("text")))
        val o = cur.select(col("doc_id").as("o_id"), sha2(col("text"), 256).as("o_sha"))
        val n = nxt.select(col("doc_id").as("n_id"), sha2(col("text"), 256).as("n_sha"))
        o.join(n, col("o_id") === col("n_id"), "full_outer")
          .select(when(col("o_id").isNull, "added")
            .when(col("n_id").isNull, "removed")
            .when(col("o_sha") =!= col("n_sha"), "changed")
            .otherwise("unchanged").as("status"),
            coalesce(col("o_id"), col("n_id")).as("id"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
            max(col("id")).as("max_id"))
          .orderBy(col("status"))
      },
      """WITH cur AS (SELECT doc_id, text FROM documents),
        |nxt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM cur WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
        |  FROM cur WHERE doc_id % 101 = 0),
        |j AS (SELECT o.doc_id AS o_id, sha256(o.text) AS o_sha,
        |             n.doc_id AS n_id, sha256(n.text) AS n_sha
        |      FROM cur o FULL OUTER JOIN nxt n ON o.doc_id = n.doc_id)
        |SELECT CASE WHEN o_id IS NULL THEN 'added'
        |            WHEN n_id IS NULL THEN 'removed'
        |            WHEN o_sha <> n_sha THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(coalesce(o_id, n_id)) AS min_id,
        |  max(coalesce(o_id, n_id)) AS max_id
        |FROM j GROUP BY 1 ORDER BY status""".stripMargin),

    // ── scalar subquery: parts priced above the global average ──
    "q_above_avg_parts" -> QueryDef(
      (spark, dir) => {
        val p = Tables.part(spark, dir)
        val avgPrice = p.agg(avg(col("p_retailprice")).as("a"))
        p.join(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("a"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            max(floor(col("p_retailprice") * 100 + 0.5).cast("long")).as("max_price_c"))
          .orderBy(col("p_brand"))
      },
      """SELECT p_brand, count(*) AS n,
        |  max(CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)) AS max_price_c
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // ── correlated aggregate (TPC-H q17 shape): lineitems under 50% of
    //    their part's average quantity ──
    "q17_small_quantity_revenue" -> QueryDef(
      (spark, dir) => {
        val l = Tables.lineitem(spark, dir)
        val perPart = l.groupBy(col("l_partkey").as("pk"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        l.join(perPart, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_c"),
            count(lit(1)).as("n"))
      },
      s"""SELECT ${cents("l_extendedprice")} AS rev_c, count(*) AS n
         |FROM lineitem l
         |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
         |                    WHERE l_partkey = l.l_partkey)""".stripMargin),

    // ── cube: all grouping-set combinations with grouping_id ──
    "q_cube_revenue" -> QueryDef(
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"))
          .orderBy(col("rf"), col("ls")),
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin),

    // ── explicit grouping sets ──
    "q_grouping_sets" -> QueryDef(
      (spark, dir) => {
        Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
        spark.sql(
          """SELECT coalesce(o_orderstatus, 'ALL') AS st,
            |  coalesce(o_orderpriority, 'ALL') AS pri, count(*) AS n
            |FROM orders_gs
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY st, pri""".stripMargin)
      },
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pri""".stripMargin),

    // ── conditional aggregation pivot shape (event counts by type) ──
    "q_pivot_events" -> QueryDef(
      (spark, dir) =>
        Tables.events(spark, dir)
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === "click", 1)).as("clicks"),
            count(when(col("event_type") === "view", 1)).as("views"),
            count(when(col("event_type") === "purchase", 1)).as("purchases"),
            count(when(col("event_type") === "error", 1)).as("errors"))
          .orderBy(col("user_id")),
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS errors
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ── k-anonymity audit: equivalence-class size histogram over the
    //    (nation, segment, $1000-balance-bucket) quasi-identifier set;
    //    min(class_size) IS the dataset's k level. Two map-combined hash
    //    aggregates, balance bucketed on integer cents ──
    "privacy_k_anon" -> QueryDef(
      (spark, dir) => {
        val base = privacyBase(spark, dir)
        graft.ops.Privacy.kAnonymityHistogram(base,
          Seq(col("nat"), col("seg"),
            floor(col("cents") / lit(100000.0)).cast("long")))
          .orderBy(col("class_size"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |cls AS (
         |  SELECT nat, seg, CAST(floor(cents / 100000.0) AS BIGINT) AS bal,
         |    CAST(count(*) AS BIGINT) AS class_size
         |  FROM base GROUP BY 1, 2, 3)
         |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(class_size) AS BIGINT) AS n_rows
         |FROM cls GROUP BY class_size ORDER BY class_size""".stripMargin),

    // ── l-diversity: distinct SENSITIVE values (market segment) per
    //    quasi-identifier class — k rows that all share one segment still
    //    leak it; min(l) is the export's diversity level ──
    "privacy_l_div" -> QueryDef(
      (spark, dir) => {
        val base = privacyBase(spark, dir)
        graft.ops.Privacy.lDiversityHistogram(base,
          Seq(col("nat"), floor(col("cents") / lit(100000.0)).cast("long")),
          col("seg"))
          .orderBy(col("l"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |cls AS (
         |  SELECT nat, CAST(floor(cents / 100000.0) AS BIGINT) AS bal,
         |    CAST(count(DISTINCT seg) AS BIGINT) AS l,
         |    CAST(count(*) AS BIGINT) AS class_size
         |  FROM base GROUP BY 1, 2)
         |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(class_size) AS BIGINT) AS n_rows
         |FROM cls GROUP BY l ORDER BY l""".stripMargin),

    // ── t-closeness (Li et al. 2007), the third leg of the anonymity
    //    triad: per (nation, segment) class, the EMD between the class's
    //    $1000-balance-bucket distribution and the global one — exact
    //    integer cumulatives cross-multiplied over n_c·n, only the final
    //    ratio rounds. Engine cumulative = triangular tiny-frame join
    //    (no global window); class grid = broadcast of the m-row spine ──
    "privacy_t_close" -> QueryDef(
      (spark, dir) => {
        val base = privacyBase(spark, dir)
        graft.ops.Privacy.tClosenessProfile(base,
          Seq("nat" -> col("nat"), "seg" -> col("seg")),
          floor(col("cents") / lit(100000.0)).cast("long"))
          .orderBy(col("nat"), col("seg"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |b AS (SELECT nat, seg, CAST(floor(cents / 100000.0) AS BIGINT) AS s
         |      FROM base),
         |g AS (SELECT s, CAST(count(*) AS BIGINT) AS n_k FROM b GROUP BY s),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |          CAST(count(DISTINCT s) AS BIGINT) AS m FROM b),
         |spine AS (SELECT s AS k,
         |            CAST(sum(n_k) OVER (ORDER BY s) AS BIGINT) AS cum_k
         |          FROM g),
         |cls AS (SELECT nat, seg, s, CAST(count(*) AS BIGINT) AS n_cs
         |        FROM b GROUP BY 1, 2, 3),
         |classes AS (SELECT nat, seg, CAST(sum(n_cs) AS BIGINT) AS n_c
         |            FROM cls GROUP BY 1, 2),
         |grid AS (SELECT c.nat, c.seg, c.n_c, sp.k, sp.cum_k
         |         FROM classes c CROSS JOIN spine sp),
         |cumc AS (SELECT gr.nat, gr.seg, gr.n_c, gr.k, gr.cum_k,
         |           CAST(coalesce(sum(cl.n_cs), 0) AS BIGINT) AS cum_ck
         |         FROM grid gr LEFT JOIN cls cl
         |           ON cl.nat = gr.nat AND cl.seg = gr.seg AND cl.s <= gr.k
         |         GROUP BY 1, 2, 3, 4, 5),
         |agg AS (SELECT nat, seg, n_c,
         |          CAST(sum(abs(cum_ck * t.n - cum_k * n_c)) AS BIGINT) AS num,
         |          t.n AS n, t.m AS m
         |        FROM cumc CROSS JOIN tot t GROUP BY 1, 2, 3, 5, 6)
         |SELECT nat, seg, n_c,
         |  CASE WHEN m = 1 THEN 0.0
         |       ELSE floor(num / ((m - 1) * n_c * n) * 10000.0 + 0.5) / 10000.0
         |  END AS emd
         |FROM agg ORDER BY nat, seg""".stripMargin),

    // ── generalization ladder to k=10: coarsen the quasi-identifier set
    //    (nation→region, segment→any, balance buckets→sign→suppressed)
    //    until every class reaches k; emits the chosen rung's class table.
    //    One aggregate probe per rung, driver state one Long each ──
    "privacy_generalize" -> QueryDef(
      (spark, dir) => {
        import graft.ops.Privacy
        val base = privacyBase(spark, dir)
        val bal = (unit: Double) =>
          floor(col("cents") / lit(unit)).cast("long").cast("string")
        val rungs = Seq(
          Privacy.Rung("nation_seg_bal1000", Seq(
            "q_geo" -> col("nat"), "q_seg" -> col("seg"), "q_bal" -> bal(100000.0))),
          Privacy.Rung("nation_seg_bal2500", Seq(
            "q_geo" -> col("nat"), "q_seg" -> col("seg"), "q_bal" -> bal(250000.0))),
          Privacy.Rung("region_seg_bal5000", Seq(
            "q_geo" -> col("reg"), "q_seg" -> col("seg"), "q_bal" -> bal(500000.0))),
          Privacy.Rung("region_any_sign", Seq(
            "q_geo" -> col("reg"), "q_seg" -> lit("*"),
            "q_bal" -> when(col("cents") < 0, lit("neg")).otherwise(lit("nonneg")))),
          Privacy.Rung("suppressed", Seq(
            "q_geo" -> lit("*"), "q_seg" -> lit("*"), "q_bal" -> lit("*"))))
        val (rung, classes) = Privacy.generalizeToK(base, rungs, k = 10L)
        classes.select(lit(rung.name).as("rung"), col("q_geo"), col("q_seg"),
          col("q_bal"), col("class_size"))
          .orderBy(col("q_geo"), col("q_seg"), col("q_bal"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |r0 AS (SELECT nat AS q_geo, seg AS q_seg,
         |         CAST(CAST(floor(cents / 100000.0) AS BIGINT) AS VARCHAR) AS q_bal,
         |         CAST(count(*) AS BIGINT) AS class_size FROM base GROUP BY 1, 2, 3),
         |r1 AS (SELECT nat AS q_geo, seg AS q_seg,
         |         CAST(CAST(floor(cents / 250000.0) AS BIGINT) AS VARCHAR) AS q_bal,
         |         CAST(count(*) AS BIGINT) AS class_size FROM base GROUP BY 1, 2, 3),
         |r2 AS (SELECT reg AS q_geo, seg AS q_seg,
         |         CAST(CAST(floor(cents / 500000.0) AS BIGINT) AS VARCHAR) AS q_bal,
         |         CAST(count(*) AS BIGINT) AS class_size FROM base GROUP BY 1, 2, 3),
         |r3 AS (SELECT reg AS q_geo, '*' AS q_seg,
         |         CASE WHEN cents < 0 THEN 'neg' ELSE 'nonneg' END AS q_bal,
         |         CAST(count(*) AS BIGINT) AS class_size FROM base GROUP BY 1, 2, 3),
         |r4 AS (SELECT '*' AS q_geo, '*' AS q_seg, '*' AS q_bal,
         |         CAST(count(*) AS BIGINT) AS class_size FROM base),
         |ch AS (SELECT CASE
         |         WHEN (SELECT min(class_size) FROM r0) >= 10 THEN 0
         |         WHEN (SELECT min(class_size) FROM r1) >= 10 THEN 1
         |         WHEN (SELECT min(class_size) FROM r2) >= 10 THEN 2
         |         WHEN (SELECT min(class_size) FROM r3) >= 10 THEN 3
         |         ELSE 4 END AS i)
         |SELECT rung, q_geo, q_seg, q_bal, class_size FROM (
         |  SELECT 'nation_seg_bal1000' AS rung, * FROM r0 WHERE (SELECT i FROM ch) = 0
         |  UNION ALL SELECT 'nation_seg_bal2500', * FROM r1 WHERE (SELECT i FROM ch) = 1
         |  UNION ALL SELECT 'region_seg_bal5000', * FROM r2 WHERE (SELECT i FROM ch) = 2
         |  UNION ALL SELECT 'region_any_sign', * FROM r3 WHERE (SELECT i FROM ch) = 3
         |  UNION ALL SELECT 'suppressed', * FROM r4 WHERE (SELECT i FROM ch) = 4)
         |ORDER BY q_geo, q_seg, q_bal""".stripMargin),

    // ── geometric-mechanism DP counts (discrete Laplace, ε = ln 2):
    //    per-nation customer counts plus integer two-sided-geometric
    //    noise drawn inverse-CDF from md5 bits (leading-ones count =
    //    Geometric(1/2); 32 − length(bin(¬h)) is engine-exact integer
    //    math), clamped at 0. Hash-seeded for audit replayability — a
    //    real release swaps in entropy and exports dp_count only ──
    "privacy_dp_counts" -> QueryDef(
      (spark, dir) => {
        val base = privacyBase(spark, dir).select(col("nat").as("grp"))
        graft.ops.Privacy.dpGeometricCounts(base, "grp", "graftdp1")
          .orderBy(col("grp"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |c AS (SELECT nat AS grp, CAST(count(*) AS BIGINT) AS true_count
         |      FROM base GROUP BY 1),
         |h AS (SELECT grp, true_count,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      i -> (strpos('0123456789abcdef',
         |              substr(md5('graftdp1|a|' || grp), i, 1)) - 1)
         |           * (16 ** (8 - i)))) AS BIGINT) AS ha,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      i -> (strpos('0123456789abcdef',
         |              substr(md5('graftdp1|b|' || grp), i, 1)) - 1)
         |           * (16 ** (8 - i)))) AS BIGINT) AS hb
         |  FROM c),
         |n AS (SELECT grp, true_count,
         |    CAST((CASE WHEN 4294967295 - ha = 0 THEN 32
         |          ELSE 32 - length(bin(4294967295 - ha)) END)
         |       - (CASE WHEN 4294967295 - hb = 0 THEN 32
         |          ELSE 32 - length(bin(4294967295 - hb)) END) AS BIGINT) AS noise
         |  FROM h)
         |SELECT grp, true_count, noise,
         |  greatest(CAST(0 AS BIGINT), true_count + noise) AS dp_count
         |FROM n ORDER BY grp""".stripMargin),

    // ── DP counts over a PUBLIC pre-enumerated domain: the release
    //    carries one row per domain key (all 25 nations) even though the
    //    fact rows are filtered to nations < 'K' — absent groups release
    //    a noised ZERO, closing the group-presence channel the bare
    //    mechanism leaks (its documented caveat). Domain broadcast both
    //    ways; count table domain-bounded via a broadcast semi gate ──
    "privacy_dp_domain" -> QueryDef(
      (spark, dir) => {
        val base = privacyBase(spark, dir)
          .filter(col("nat") < "K").select(col("nat").as("grp"))
        val domain = Tables.nation(spark, dir).select(col("n_name"))
        graft.ops.Privacy.dpGeometricCounts(base, "grp", "graftdp2", domain)
          .orderBy(col("grp"))
      },
      s"""WITH base AS ($privacyBaseSql),
         |dom AS (SELECT DISTINCT n_name AS grp FROM nation),
         |c0 AS (SELECT nat AS grp, CAST(count(*) AS BIGINT) AS tc
         |      FROM base WHERE nat < 'K' GROUP BY 1),
         |c AS (SELECT dom.grp, coalesce(c0.tc, 0) AS true_count
         |      FROM dom LEFT JOIN c0 USING (grp)),
         |h AS (SELECT grp, true_count,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      i -> (strpos('0123456789abcdef',
         |              substr(md5('graftdp2|a|' || grp), i, 1)) - 1)
         |           * (16 ** (8 - i)))) AS BIGINT) AS ha,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      i -> (strpos('0123456789abcdef',
         |              substr(md5('graftdp2|b|' || grp), i, 1)) - 1)
         |           * (16 ** (8 - i)))) AS BIGINT) AS hb
         |  FROM c),
         |n AS (SELECT grp, true_count,
         |    CAST((CASE WHEN 4294967295 - ha = 0 THEN 32
         |          ELSE 32 - length(bin(4294967295 - ha)) END)
         |       - (CASE WHEN 4294967295 - hb = 0 THEN 32
         |          ELSE 32 - length(bin(4294967295 - hb)) END) AS BIGINT) AS noise
         |  FROM h)
         |SELECT grp, true_count, noise,
         |  greatest(CAST(0 AS BIGINT), true_count + noise) AS dp_count
         |FROM n ORDER BY grp""".stripMargin),

    // ── DP quantiles = post-processed DP histogram: ONE geometric-
    //    mechanism release over a public $50k price grid (disjoint
    //    buckets → parallel composition, ε = ln 2 total), then each
    //    percentile reads the first bucket whose released cumulative
    //    reaches ⌈pct·total/100⌉ — post-processing, no extra ε. Oracle
    //    replays the md5 noise draw and the ceil-division selection
    //    bit-exactly ──
    "privacy_dp_quantile" -> QueryDef(
      (spark, dir) => {
        val buckets = Tables.orders(spark, dir)
          .select(expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 5000000")
            .as("b"))
        graft.ops.Privacy
          .dpHistogramQuantiles(buckets, "b", "graftdpq", 128,
            Seq(25, 50, 75, 90, 99))
          .select(col("pct"), col("bucket"),
            (col("bucket") * 5000000L).as("lo_cents"))
          .orderBy(col("pct"))
      },
      """WITH c0 AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    // 5000000 AS b FROM orders),
        |dom AS (SELECT CAST(unnest(generate_series(0, 127)) AS BIGINT) AS grp),
        |cnt AS (SELECT b AS grp, CAST(count(*) AS BIGINT) AS tc
        |        FROM c0 WHERE b BETWEEN 0 AND 127 GROUP BY 1),
        |c AS (SELECT dom.grp, coalesce(cnt.tc, 0) AS true_count
        |      FROM dom LEFT JOIN cnt USING (grp)),
        |h AS (SELECT grp, true_count,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (strpos('0123456789abcdef',
        |              substr(md5('graftdpq|a|' || grp), i, 1)) - 1)
        |           * (16 ** (8 - i)))) AS BIGINT) AS ha,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (strpos('0123456789abcdef',
        |              substr(md5('graftdpq|b|' || grp), i, 1)) - 1)
        |           * (16 ** (8 - i)))) AS BIGINT) AS hb
        |  FROM c),
        |d AS (SELECT grp,
        |    greatest(0, true_count +
        |      CAST((CASE WHEN 4294967295 - ha = 0 THEN 32
        |            ELSE 32 - length(bin(4294967295 - ha)) END)
        |         - (CASE WHEN 4294967295 - hb = 0 THEN 32
        |            ELSE 32 - length(bin(4294967295 - hb)) END) AS BIGINT))
        |      AS dp
        |  FROM h),
        |cum AS (SELECT d1.grp AS cb, CAST(sum(d2.dp) AS BIGINT) AS cum
        |        FROM d d1 JOIN d d2 ON d2.grp <= d1.grp GROUP BY 1),
        |tot AS (SELECT CAST(sum(dp) AS BIGINT) AS tot FROM d),
        |q AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct),
        |t AS (SELECT pct, (tot.tot * pct + 99) // 100 AS target
        |      FROM q CROSS JOIN tot)
        |SELECT CAST(t.pct AS INT) AS pct, CAST(min(cb) AS BIGINT) AS bucket,
        |  CAST(min(cb) * 5000000 AS BIGINT) AS lo_cents
        |FROM t JOIN cum ON cum.cum >= t.target
        |GROUP BY t.pct ORDER BY pct""".stripMargin)
  )

  /** customer ⋈ broadcast(nation) ⋈ broadcast(region) with integer-cents
    * balance — the shared quasi-identifier base for the privacy queries.
    */
  private def privacyBase(spark: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("nat"), col("r_name").as("reg"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))

  // NOTE: must not be a val — `defs` above interpolates it during object
  // init, and a later-declared val would still be null at that point
  private def privacyBaseSql: String =
    """SELECT n.n_name AS nat, r.r_name AS reg, c.c_mktsegment AS seg,
      |    CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |                  JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin
}
