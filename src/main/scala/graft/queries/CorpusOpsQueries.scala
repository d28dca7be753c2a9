package graft.queries

import graft.{QueryDef, Tables}
import graft.dedup.BloomDecon
import graft.text.{Retrieval, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval, corpus-hygiene, and distribution-sketch operators: BM25
  * ranking, inverted-index lookup, Bloom-filter decontamination, and
  * histogram quantiles — the remaining ops a training-data pipeline
  * leans on at corpus scale, each under the DuckDB oracle gate.
  */
object CorpusOpsQueries {

  import TrainQueries.{toksSql, shinglesSql}

  private val bm25Terms = Seq("hash", "merge", "window")
  private val searchTerms = Seq("scan", "filter", "batch")

  /** DuckDB rendering of `BloomDecon.position`: first 4 md5 hex chars of
    * (e || "#i") as an int, mod m.
    */
  private def posSql(e: String, i: Int, m: Int): String = {
    val h = (1 to 4).map { j =>
      val w = math.pow(16, 4 - j).toInt
      s"(strpos('0123456789abcdef', substr(md5($e || '#$i'), $j, 1)) - 1)" +
        (if (w > 1) s" * $w" else "")
    }.mkString(" + ")
    s"(($h) % $m)"
  }

  /** One BM25 term's score contribution, SQL side. Parenthesization
    * mirrors Retrieval.bm25 exactly — IEEE doubles are deterministic
    * given identical operand order.
    */
  private def bm25TermSql(term: String, dfCol: String): String = {
    val tf = s"CAST(len(list_filter(toks, x -> x = '$term')) AS DOUBLE)"
    val idf = s"ln((((CAST(n_docs AS DOUBLE) - CAST($dfCol AS DOUBLE)) + 0.5)" +
      s" / (CAST($dfCol AS DOUBLE) + 0.5)) + 1.0)"
    val dlNorm = "(0.25 + (0.75 * (CAST(len(toks) AS DOUBLE)" +
      " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    s"($idf * (($tf * (1.2 + 1.0)) / ($tf + 1.2 * $dlNorm)))"
  }

  val defs: Map[String, QueryDef] = Map(

    // ── BM25 ranking: one global stats row broadcast into a columnar
    //    scoring pass; score rounded to 4dp for rank stability ──
    "text_bm25" -> QueryDef(
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Retrieval.bm25(docs, "doc_id", "toks", bm25Terms)
          .select(col("doc_id"),
            floor(col("score") * 10000 + 0.5).cast("long").as("score_4"))
          .orderBy(col("score_4").desc, col("doc_id"))
          .limit(20)
      }, {
        val dfSql = bm25Terms.zipWithIndex.map { case (t, i) =>
          s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
        }.mkString(", ")
        val scoreSql = bm25Terms.zipWithIndex
          .map { case (t, i) => bm25TermSql(t, s"df_$i") }.mkString(" + ")
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len(toks)) AS BIGINT) AS sum_dl, $dfSql FROM d)
           |SELECT doc_id,
           |  CAST(floor(($scoreSql) * 10000 + 0.5) AS BIGINT) AS score_4
           |FROM d, st
           |ORDER BY score_4 DESC, doc_id LIMIT 20""".stripMargin
      }),

    // ── inverted-index lookup: postings filtered against the broadcast
    //    query-term list before any shuffle; integer-only scoring ──
    "text_search_topk" -> QueryDef(
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Retrieval.searchTopK(docs, "doc_id", "toks", searchTerms, 20)
      },
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |m AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |      FROM tok WHERE term IN (${searchTerms.map("'" + _ + "'").mkString(", ")})
         |      GROUP BY 1, 2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(tf) AS BIGINT) AS tf_sum
         |FROM m GROUP BY doc_id
         |ORDER BY n_terms DESC, tf_sum DESC, doc_id LIMIT 20""".stripMargin),

    // ── Bloom-filter decontamination: eval shingles → 65536-bit bitset
    //    (md5 family, SQL-replayable) broadcast as a literal; corpus
    //    probed columnar-side; exact verify only over candidates ──
    "train_bloom_decontaminate" -> QueryDef(
      (spark, dir) => {
        val sh = array_distinct(TextAnalysis.shingles(col("text"), 3))
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), sh.as("sh"))
        val eval = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        BloomDecon.summary(train, eval, "doc_id", "sh", m = 65536, k = 3)
      }, {
        val m = 65536
        val inPos = (i: Int) =>
          s"${posSql("g", i, m)} IN (SELECT p FROM pos)"
        s"""WITH t AS ($shinglesSql),
           |e AS (SELECT id, unnest(sh) AS g FROM t),
           |evs AS (SELECT DISTINCT g FROM e WHERE id % 97 = 0),
           |pos AS (SELECT DISTINCT p FROM (
           |  SELECT ${posSql("g", 1, m)} AS p FROM evs
           |  UNION ALL SELECT ${posSql("g", 2, m)} FROM evs
           |  UNION ALL SELECT ${posSql("g", 3, m)} FROM evs)),
           |tr AS (SELECT DISTINCT id, g FROM e WHERE id % 97 <> 0),
           |cand AS (SELECT DISTINCT id FROM tr
           |  WHERE ${inPos(1)} AND ${inPos(2)} AND ${inPos(3)}),
           |hits AS (SELECT DISTINCT tr.id FROM tr JOIN evs USING (g))
           |SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 97 <> 0) AS n_train,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           |  (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand
           |     WHERE id NOT IN (SELECT id FROM hits)) AS n_false_pos""".stripMargin
      }),

    // ── histogram quantiles: one shuffle to $100 buckets, cumulative
    //    window over the tiny bucket frame, integer-exact rank targets
    //    via cross-multiplication (cum·100 ≥ p·n) ──
    "stats_quantile_hist" -> QueryDef(
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val bkts = Tables.lineitem(spark, dir)
          .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
          .select(expr("cents DIV 10000").as("bkt"))
          .groupBy(col("bkt"))
          .agg(count(lit(1)).as("n_b"))
        // the ordered/global windows run over one row per bucket — a few
        // hundred rows regardless of corpus size
        val wc = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ps = Seq(50, 90, 99).toDF("p")
        bkts
          .withColumn("cum", sum(col("n_b")).over(wc))
          .withColumn("n", sum(col("n_b")).over(Window.partitionBy()))
          .join(broadcast(ps))
          .filter(col("cum") * 100 >= col("p") * col("n") &&
            (col("cum") - col("n_b")) * 100 < col("p") * col("n"))
          .select(col("p"), col("bkt"), (col("bkt") * 10000).as("lo_c"),
            ((col("bkt") + 1) * 10000 - 1).as("hi_c"),
            col("n_b"), col("cum"), col("n"))
          .orderBy(col("p"))
      },
      """WITH c AS (SELECT CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
        |           FROM lineitem),
        |b AS (SELECT cents // 10000 AS bkt, CAST(count(*) AS BIGINT) AS n_b
        |      FROM c GROUP BY 1),
        |w AS (SELECT bkt, n_b,
        |  CAST(sum(n_b) OVER (ORDER BY bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(n_b) OVER () AS BIGINT) AS n FROM b)
        |SELECT p, bkt, bkt*10000 AS lo_c, (bkt+1)*10000 - 1 AS hi_c, n_b, cum, n
        |FROM w CROSS JOIN (VALUES (50), (90), (99)) p(p)
        |WHERE cum*100 >= p*n AND (cum - n_b)*100 < p*n
        |ORDER BY p""".stripMargin)
  )
}
