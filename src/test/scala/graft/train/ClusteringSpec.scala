package graft.train

import graft.SparkSpec
import graft.dedup.Dedup
import graft.sim.{Clustering, Quantize, Similarity}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeans: total assignment, ≤k clusters, ids are seed ids") {
    val n = emb.count()
    val a = Clustering.kmeansAssign(emb, k = 8, iters = 2)
    assert(a.count() == n)
    assert(a.select($"id").distinct().count() == n)
    val clusterIds = a.select($"cid").distinct().as[Long].collect().toSet
    assert(clusterIds.size <= 8)
    val seeds = emb
      .orderBy(md5($"vec_id".cast("string")), $"vec_id").limit(8)
      .select($"vec_id").as[Long].collect().toSet
    assert(clusterIds.subsetOf(seeds))
  }

  test("kmeans assignment is partitioning-invariant (exact fixed-point scores)") {
    val a = Clustering.kmeansAssign(emb, 8, 2).orderBy($"id").collect().toSeq
    val b = Clustering.kmeansAssign(emb.repartition(13), 8, 2)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("kmeans iterations improve (never worsen) the within-cluster SSE") {
    // Lloyd's monotonicity on the EUCLIDEAN objective the assignment now
    // optimizes (argmax 2⟨v,c⟩−‖c‖² = argmin ‖v−c‖²): mean ‖v−c‖² under
    // the iter-2 assignment/centroids ≤ under iter-1's. Tolerance covers
    // the ≤0.5-micro-unit-per-dim centroid rounding.
    def meanSqDist(iters: Int): Double = {
      val a = Clustering.kmeansAssign(emb, 8, iters)
      val m = a.join(emb.select($"vec_id".as("id"), $"embedding"), Seq("id"))
      val cv = Similarity.groupCentroids(m, col("cid"), "embedding")
        .withColumn("c", ($"sum_u".cast("double") / 1e6) / $"n")
        .groupBy($"grp").agg(
          transform(array_sort(collect_list(struct($"dim", $"c"))),
            x => x.getField("c")).as("cv"))
      m.join(cv, $"cid" === $"grp")
        .select((Similarity.dot($"embedding", $"embedding")
          - lit(2.0) * Similarity.dot($"embedding", $"cv")
          + Similarity.dot($"cv", $"cv")).as("d2"))
        .agg(avg($"d2")).as[Double].head()
    }
    assert(meanSqDist(2) <= meanSqDist(1) + 1e-6)
  }

  test("semDedup drops exactly the vectors with a smaller-id in-cluster neighbour ≥ t") {
    val t = 0.45
    val r = Clustering.semDedup(emb, 8, 2, t).cache()
    val m = r.join(emb.select($"vec_id".as("id"), $"embedding"), Seq("id"))
    val expected = m.as("a").join(m.as("b"),
        $"a.cluster" === $"b.cluster" && $"b.id" < $"a.id")
      .withColumn("sim", Similarity.round6(
        Similarity.dot($"a.embedding", $"b.embedding")))
      .filter($"sim" >= t)
      .select($"a.id").distinct().as[Long].collect().toSet
    val dropped = r.filter($"dropped").select($"id").as[Long].collect().toSet
    assert(dropped == expected)
    // min id of every cluster always survives
    val minIds = r.groupBy($"cluster").agg(min($"id").as("m"))
      .select($"m").as[Long].collect().toSet
    assert(minIds.forall(id => !dropped.contains(id)))
    r.unpersist()
  }

  test("int8 codes are bounded and exact under the quantization formula") {
    val codes = Quantize.int8Codes(emb, 64)
    val flat = codes.select(explode($"q").as("v")).as[Long].collect()
    assert(flat.forall(v => v >= -128 && v <= 127))
    assert(codes.count() == emb.count())
  }

  test("int8TopK ranks by exact integer dot and roughly tracks float top-k") {
    val q = Quantize.int8TopK(emb, 64, k = 5, queryMod = 50)
      .select($"qid", $"nid", $"rank").as[(Long, Long, Int)].collect()
    val exact = Similarity.topK(
        emb.filter(pmod($"vec_id", lit(50)) === 0), emb, 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val hits = q.count { case (qid, nid, _) => exact.contains((qid, nid)) }
    // quantization noise may reorder the tail but must keep most of top-5
    assert(hits.toDouble / q.length >= 0.6, s"recall ${hits.toDouble / q.length}")
  }

  test("charWindowProfile: planted exact duplicate saturates dup_frac") {
    val docs = Seq(
      (1L, "a" * 35 + " the quick brown fox jumps over the lazy dog " + "b" * 35),
      (2L, "a" * 35 + " the quick brown fox jumps over the lazy dog " + "b" * 35),
      (3L, "entirely different content with no shared windows at all " + "c" * 60)
    ).toDF("doc_id", "text")
    val p = Dedup.charWindowProfile(docs, 40, 10)
      .orderBy($"id").as[(Long, Long, Long, Double)].collect()
    assert(p(0)._4 == 1.0 && p(1)._4 == 1.0) // identical docs: all windows shared
    assert(p(2)._3 == 0L && p(2)._4 == 0.0)  // unique doc: nothing shared
    assert(p(2)._2 > 0L)                     // but it does have windows
  }

  test("charWindowProfile: docs shorter than the window get n_win = 0") {
    val docs = Seq((1L, "short"), (2L, "x" * 80)).toDF("doc_id", "text")
    val p = Dedup.charWindowProfile(docs, 40, 10)
      .orderBy($"id").as[(Long, Long, Long, Double)].collect()
    assert(p(0)._2 == 0L && p(0)._4 == 0.0)
    // "x"*80: all 5 windows hash identically (same content) → 1 distinct
    assert(p(1)._2 == 1L)
  }

  test("dyadicSpanProfile certifies shared spans within 2x and counts min-level windows") {
    // docs 1/2 share exactly a 20-char span ("SHAREDSPAN0123456789"); the
    // rest of each doc uses a disjoint alphabet so no accidental 8-grams.
    val span = "SHAREDSPAN0123456789" // 20 chars → certified at 16, not 32
    val docs = Seq(
      (1L, "a" * 30 + span + "b" * 30),
      (2L, "c" * 30 + span + "d" * 30),
      (3L, "e" * 70),  // unique alphabet, no cross-doc windows
      (4L, "tiny")     // shorter than the min level
    ).toDF("doc_id", "text")
    val p = Dedup.dyadicSpanProfile(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect()
    assert(p(0)._2 == 16 && p(1)._2 == 16,
      s"20-char planted span must certify at dyadic 16, got ${p.toSeq}")
    // shared 8-windows inside a 20-char span: 20-8+1 = 13 start offsets,
    // all distinct substrings here
    assert(p(0)._3 == 13L && p(1)._3 == 13L)
    assert(p(2)._2 == 0 && p(2)._3 == 0L)
    assert(p(3)._2 == 0 && p(3)._3 == 0L)
  }

  test("dyadicSpanProfile: native rolling-hash windows match the declarative rendering") {
    // overlapping repeats, within-doc dups, short docs, non-ASCII, and a
    // supplementary-plane char (code-point vs code-unit trap)
    val docs = Seq(
      (1L, "abcabcabcabcabcabcabcabc zz " + "q" * 40),
      (2L, "xxabcabcabcabcabcabcabcabcxx"),
      (3L, "héllo wörld héllo wörld héllo wörld héllo wörld"),
      (4L, "héllo wörld héllo wörld héllo wörld héllo wörld ok"),
      (5L, "😀abcdefgh😀abcdefgh😀abcdefgh"),
      (6L, "short")
    ).toDF("doc_id", "text")
    val native = Dedup.dyadicSpanProfile(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect().toSeq
    val decl = Dedup.dyadicSpanProfileDeclarative(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect().toSeq
    assert(native == decl, s"native $native vs declarative $decl")
    assert(native(2)._2 >= 32) // the repeated héllo-wörld span is long
  }

  test("dyadicSpanProfile: an exact duplicate certifies at the top level") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog, twice over " + "x" * 40),
      (2L, "the quick brown fox jumps over the lazy dog, twice over " + "x" * 40)
    ).toDF("doc_id", "text")
    val p = Dedup.dyadicSpanProfile(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect()
    assert(p.forall(_._2 == 64), s"96-char identical docs certify at 64: ${p.toSeq}")
  }

  test("dyadicSpanProfileWinnowed: cover guarantee at L+w-1, exact n_dup_min, " +
    "reduced volume") {
    // 31-char shared span = 16 + 16 - 1 → the winnow GUARANTEE applies at
    // level 16 (a full 16-frame of level-16 anchors sits inside the run)
    val span = "SHAREDSPANABCDEFGHIJKLMNOPQRSTU" // 31 chars
    assert(span.length == 31)
    val docs = Seq(
      (1L, "a" * 40 + span + "b" * 40),
      (2L, "c" * 40 + span + "d" * 40),
      (3L, "e" * 90),
      (4L, "the quick brown fox jumps over the lazy dog, twice over " + "x" * 40),
      (5L, "the quick brown fox jumps over the lazy dog, twice over " + "x" * 40),
      (6L, "😀abcdefgh😀abcdefgh😀abcdefgh min" + "g" * 40),
      (7L, "tiny")
    ).toDF("doc_id", "text")
    val win = Dedup.dyadicSpanProfileWinnowed(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect().toSeq
    val exact = Dedup.dyadicSpanProfile(docs)
      .orderBy($"id").as[(Long, Int, Long)].collect().toSeq
    assert(win(0)._2 >= 16 && win(1)._2 >= 16,
      s"31-char planted span must survive winnowing at level 16: $win")
    // identical docs: every selected window is shared → top level certifies
    assert(win(3)._2 == 64 && win(4)._2 == 64)
    // sampling only ever REMOVES coarse windows…
    assert(win.zip(exact).forall { case (w, e) => w._2 <= e._2 })
    // …and never touches level 8: n_dup_min is bit-identical to stride-1
    assert(win.map(x => (x._1, x._3)) == exact.map(x => (x._1, x._3)))
    // emitted-window volume on VARIED text (constant runs like "a"*40 tie
    // every anchor, so each frame's rightmost-min is distinct — degenerate
    // density ~1; their windows are also all content-identical, so the
    // per-doc distinct collapses them anyway): sampled coarse levels must
    // sit well under stride-1 — expected ≈ (n + 3n·2/(w+1))/4n ≈ 0.34
    import org.apache.spark.sql.functions.{size => asize, sum => fsum}
    val varied = Seq(
      (1L, (0 until 600).map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar).mkString),
      (2L, (0 until 600).map(i => ('a' + (i * 11 + i * i % 17) % 26).toChar).mkString)
    ).toDF("doc_id", "text")
    val full = varied.select(asize(graft.functions.dyadic_window_hashes(
        $"text", Seq(8, 16, 32, 64))).cast("long").as("n"))
      .agg(fsum($"n")).as[Long].head()
    val sampled = varied.select(asize(graft.functions.dyadic_window_hashes_winnow(
        $"text", Seq(8, 16, 32, 64), 16, 16)).cast("long").as("n"))
      .agg(fsum($"n")).as[Long].head()
    assert(sampled < full / 2,
      s"winnowed volume $sampled should be well under stride-1 $full")
  }

  test("containment catches subset docs that jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 200).map(i => s"filler$i word$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, 3, 0.9).collect()
    assert(cont.length == 1) // small's shingles all inside big
    val jac = Dedup.jaccardPairs(docs, 3, 0.5).collect()
    assert(jac.isEmpty) // symmetric jaccard dilutes the same pair to ~0.01
  }

  test("clusterTopTerms surfaces each cluster's distinctive vocabulary") {
    // two synthetic clusters with disjoint signature terms on top of a
    // shared background vocabulary; lift must rank the signatures first
    val docs = (0L until 40L).map { i =>
      val sig = if (i < 20) "quantum flux entangle" else "glacier moraine till"
      (i, s"the of and $sig $sig the of and common words here")
    }
    val assign = docs.map { case (i, _) => (i, if (i < 20) 0L else 1L) }
      .toDF("doc_id", "cluster")
    val terms = docs.toDF("doc_id", "text")
      .select($"doc_id",
        explode(graft.text.TextAnalysis.tokens($"text")).as("term"))
    val top = Clustering.clusterTopTerms(assign, terms, minTf = 5, topK = 3)
      .collect()
    val byCluster = top.groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(4)).map(_.getString(1)).toSeq).toMap
    assert(byCluster(0L).toSet == Set("quantum", "flux", "entangle"))
    assert(byCluster(1L).toSet == Set("glacier", "moraine", "till"))
    // signature terms: in-cluster rate = 2× corpus rate (each appears
    // only in its half) → lift 2,000,000 ppm; background terms ≈ 1e6
    top.foreach(r => assert(r.getLong(3) == 2000000L,
      s"signature lift should be exactly 2x: $r"))
    // ranks are 1..3 per cluster, deterministic ties by term
    assert(byCluster(0L) == Seq("entangle", "flux", "quantum"))
  }
}
