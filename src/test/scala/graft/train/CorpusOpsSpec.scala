package graft.train

import graft.{SparkSpec, Tables}
import graft.dedup.BloomDecon
import graft.text.{Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)
    .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))

  test("bm25: zero-overlap docs score 0; scores are finite and non-negative") {
    val terms = Seq("hash", "merge", "window")
    val scored = Retrieval.bm25(docs, "doc_id", "toks", terms)
      .join(docs, Seq("doc_id"))
      .withColumn("overlap",
        terms.map(t => array_contains(col("toks"), t).cast("int")).reduce(_ + _))
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(!s.isNaN && !s.isInfinite && s >= 0.0)
      if (r.getAs[Int]("overlap") == 0) assert(s == 0.0, s"doc ${r.get(0)}")
      if (r.getAs[Int]("overlap") > 0) assert(s > 0.0, s"doc ${r.get(0)}")
    }
  }

  test("bm25: rarer term contributes more than a common one at equal tf") {
    // construct a two-term corpus where term A is in 1 doc, term B in all
    val rows = Seq("alpha beta", "beta", "beta", "beta").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val d = spark.createDataFrame(rows).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val s = Retrieval.bm25(d, "doc_id", "toks", Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 0 has both terms; its score must exceed any beta-only doc
    assert(s(0L) > s(1L))
  }

  test("searchTopK matches a naive per-doc count") {
    val terms = Seq("scan", "filter", "batch")
    val got = Retrieval.searchTopK(docs, "doc_id", "toks", terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = docs.select(col("doc_id"),
        terms.map(t => when(array_contains(col("toks"), t), 1L).otherwise(0L))
          .reduce(_ + _).as("n_terms"),
        terms.map(t => Retrieval.termFreq(col("toks"), t).cast("long"))
          .reduce(_ + _).as("tf_sum"))
      .filter(col("n_terms") > 0)
      .orderBy(col("n_terms").desc, col("tf_sum").desc, col("doc_id"))
      .limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == naive.toSeq)
  }

  test("tfidfKeywords: doc-unique term outranks the corpus-wide filler") {
    import spark.implicits._
    // "zebra" appears only in doc 1; "the" in every doc with higher tf
    val mini = Seq(
      (1L, Seq("the", "the", "the", "zebra", "the")),
      (2L, Seq("the", "cat", "the")),
      (3L, Seq("the", "dog", "dog"))).toDF("doc_id", "toks")
    val top = Retrieval.tfidfKeywords(mini, "doc_id", "toks", k = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    assert(top(1L) == "zebra", s"got $top")
    assert(top(2L) == "cat" && top(3L) == "dog")
    // score is the documented integer: tf * ((N*1e6 DIV df) - 1e6)
    val z = Retrieval.tfidfKeywords(mini, "doc_id", "toks", 1)
      .filter($"doc_id" === 1L).select($"score").as[Long].head()
    assert(z == 1L * (3L * 1000000L / 1L - 1000000L))
  }

  test("rrfFuse: presence in both lists beats a single higher rank") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", kRrf = 60, topK = 10)
      .as[(Long, Long, Int)].collect()
    // doc 20 (ranks 2+1) must beat doc 10 (rank 1 in one list only)
    assert(fused.head._1 == 20L && fused.head._3 == 2)
    val m = fused.map(r => r._1 -> r._2).toMap
    assert(m(20L) == 1000000L / 62 + 1000000L / 61)
    assert(m(10L) == 1000000L / 61 && m(40L) == 1000000L / 62)
  }

  test("bloom probe has no false negatives and summary counts reconcile") {
    val sh = array_distinct(TextAnalysis.shingles(col("text"), 3))
    val d = Tables.documents(spark, dir).select(col("doc_id"), sh.as("sh"))
    val eval = d.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = d.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val row = BloomDecon.summary(train, eval, "doc_id", "sh", m = 65536, k = 3)
      .collect().head
    val (nTrain, nCand, nTrue, nFp) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nCand >= nTrue, "bloom must never miss a true hit")
    assert(nFp == nCand - nTrue)
    assert(nTrain >= nCand)
    // ground truth via exact semi-join
    val evalSh = eval.select(explode(col("sh")).as("g")).distinct()
    val trueIds = train.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(evalSh, Seq("g")).select("doc_id").distinct().count()
    assert(nTrue == trueIds)
  }

  test("bloom probe: every eval shingle tests positive against its own bitset") {
    val evalSh = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(explode(array_distinct(TextAnalysis.shingles(col("text"), 3))).as("g"))
      .distinct()
    val bits = BloomDecon.buildBits(evalSh, "g", m = 65536, k = 3)
    val misses = evalSh
      .withColumn("hit", BloomDecon.probe(array(col("g")), bits, 65536, 3))
      .filter(!col("hit")).count()
    assert(misses == 0L)
  }

  test("bloom probe: native loop ≡ declarative HOF rendering (r13 parity)") {
    import spark.implicits._
    // small m so both hits and misses occur; keys include members,
    // non-members, multi-key arrays, and an empty array
    val keys = (0L until 500L).map(i => s"key$i")
    val evalKeys = keys.filter(_.hashCode % 3 == 0).toDF("g")
    val bits = BloomDecon.buildBits(evalKeys, "g", m = 1024, k = 3)
    val probes = (0L until 1000L).map(i => Seq(s"key$i"))
      .:+(Seq("key1", "key3", "nope"))
      .:+(Seq.empty[String])
      .toDF("arr")
    val both = probes.select(
      BloomDecon.probe(col("arr"), bits, 1024, 3).as("native"),
      BloomDecon.probeDeclarative(col("arr"), bits, 1024, 3).as("decl"))
    assert(both.filter(not(col("native") <=> col("decl"))).count() == 0L)
    // null-element 3-valued logic matches `exists`
    val nulls = Seq((1, Seq[String](null)), (2, Seq("key0", null)))
      .toDF("id", "arr")
    val nb = nulls.select(col("id"),
      BloomDecon.probe(col("arr"), bits, 1024, 3).as("native"),
      BloomDecon.probeDeclarative(col("arr"), bits, 1024, 3).as("decl"))
    assert(nb.filter(not(col("native") <=> col("decl"))).count() == 0L)
  }

  test("quantile hist: monotone targets and rank bracketing") {
    val out = graft.queries.CorpusOpsQueries.defs("stats_quantile_hist")
      .fn(spark, dir).collect()
    assert(out.map(_.getAs[Int]("p")).toSeq == Seq(50, 90, 99))
    val byP = out.map(r => r.getAs[Int]("p") -> r).toMap
    // bucket lower bounds must be non-decreasing in p
    assert(byP(50).getAs[Long]("bkt") <= byP(90).getAs[Long]("bkt"))
    assert(byP(90).getAs[Long]("bkt") <= byP(99).getAs[Long]("bkt"))
    out.foreach { r =>
      val (p, nB, cum, n) = (r.getAs[Int]("p"), r.getAs[Long]("n_b"),
        r.getAs[Long]("cum"), r.getAs[Long]("n"))
      assert(cum * 100 >= p.toLong * n && (cum - nB) * 100 < p.toLong * n,
        s"p$p rank not inside its bucket")
    }
  }
}
