package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def starEdges = {
    // hub 0 connected to 1..9, plus a 10-11 pendant pair
    val rel = ((1 to 9).map(i => (0L, i.toLong)) :+ (10L, 11L)).toDF("a", "b")
    Graph.undirectedEdges(rel, "a", "b")
  }

  test("hub node dominates a star graph; pendant pair ranks equal") {
    val pr = Graph.pagerank(starEdges, iters = 5)
      .orderBy($"r".desc, $"node").as[(Long, Long, Long)].collect()
    assert(pr.head._1 == 0L, s"hub should rank first, got ${pr.head}")
    val pendants = pr.filter(r => r._1 == 10L || r._1 == 11L).map(_._3)
    assert(pendants.distinct.length == 1, "symmetric pendant pair must tie")
    // spokes are symmetric: all nine share one rank value below the hub
    val spokes = pr.filter(r => r._1 >= 1L && r._1 <= 9L).map(_._3)
    assert(spokes.distinct.length == 1 && spokes.head < pr.head._3)
  }

  test("total mass is conserved up to floor loss (≤ 20·Σdeg nano-units/iter)") {
    val e = starEdges
    val n = e.select($"src").distinct().count()
    val sumDeg = e.count() // Σ deg = edge-direction count
    val total = Graph.pagerank(e, iters = 5).agg(sum($"r")).as[Long].head()
    val exact = n * 1000000000L
    assert(total <= exact, "integer floors can only lose mass")
    assert(exact - total <= 5L * 20L * sumDeg * 2, // loose: iters × per-edge loss
      s"mass leak too large: $exact -> $total")
  }

  test("triangles: K4 has 4 triangles, 3 per node; appended path adds none") {
    // K4 on 1..4 plus a pendant path 4-5-6 (no new triangles)
    val k4 = for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong)
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val tri = Graph.triangles(pairs).as[(Long, Long)].collect().toMap
    assert((1 to 4).forall(i => tri(i.toLong) == 3L), s"K4 nodes: $tri")
    assert(!tri.contains(5L) && !tri.contains(6L), "path nodes join no triangle")
  }

  test("triangles: orientation makes the count partitioning-invariant") {
    val pairs = (for { i <- 1 to 8; j <- (i + 1) to 8; if (i + j) % 3 != 0 }
      yield (i.toLong, j.toLong)).toDF("a", "b")
    val a = Graph.triangles(pairs).orderBy($"node").collect().toSeq
    val b = Graph.triangles(pairs.repartition(5)).orderBy($"node").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("ranks are partitioning-invariant (pure integer arithmetic)") {
    val a = Graph.pagerank(starEdges, 5).orderBy($"node").collect().toSeq
    val b = Graph.pagerank(starEdges.repartition(7), 5).orderBy($"node").collect().toSeq
    assert(a == b)
  }

  test("personalized PageRank: mass stays near seeds; unreachable nodes at 0") {
    // star (0 hub, spokes 1..9) + disconnected pendant pair 10-11;
    // seed = the hub only
    val seeds = Seq(0L).toDF("node")
    val ppr = Graph.personalizedPagerank(starEdges, seeds, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // unreachable component gets exactly zero
    assert(ppr(10L) == 0L && ppr(11L) == 0L)
    // hub keeps its teleport base plus returned flow — strictly the max
    assert(ppr(0L) > ppr(1L))
    // spokes are symmetric and positive (one hop from the seed)
    val spokes = (1L to 9L).map(ppr)
    assert(spokes.distinct.length == 1 && spokes.head > 0L)
    // non-seed spokes hold ONLY propagated mass: no teleport base
    assert(spokes.head < 150000000L)
  }

  test("bfsHops labels each node at its minimum hop, bounded by maxHops") {
    // chain 1-2-3-4-5-6 plus a shortcut 1-4 and an unreachable node 9-10
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (9L, 10L))
    val edges = und.toDF("a", "b").select($"a".as("src"), $"b".as("dst"))
      .unionAll(und.toDF("a", "b").select($"b".as("src"), $"a".as("dst")))
    val sources = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, sources, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    // shortcut wins: node 4 is 1 hop via (1,4), node 5 = 2, node 6 = 3
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2, 6L -> 3))
    // beyond maxHops and disconnected components stay unlabelled
    assert(!got.contains(9L) && !got.contains(10L))
    val again = Graph.bfsHops(edges.repartition(5), sources, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(again == got)
  }

  test("labelPropagation: two cliques joined by one bridge edge split into two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10
    def clique(ns: Seq[Long]) =
      for (i <- ns; j <- ns if i < j) yield (i, j)
    val und = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L)
    val edges = Graph.undirectedEdges(und.toDF("a", "b"), "a", "b")
    val labs = Graph.labelPropagation(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    // each clique converges to ONE label; min tie-break keeps them distinct
    assert(Set(1L, 2L, 3L).map(labs) == Set(labs(2L)) && labs(2L) <= 4L)
    assert(Set(11L, 12L, 13L).map(labs) == Set(labs(11L)) && labs(11L) >= 10L)
    assert(labs(2L) != labs(11L))
    // deterministic under repartitioning (argmax is order-free)
    val again = Graph.labelPropagation(edges.repartition(7), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(again == labs)
  }

  test("kcore: pendant chain peels off, clique core survives; relative k matches") {
    // K4 on {1,2,3,4} plus a chain 4-5-6 (deg(5)=2, deg(6)=1)
    val pairs = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))).toDF("a", "b")
    val core3 = Graph.kcore(pairs, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 6 peels (deg 1), then 5 (deg 1 after), K4 survives at deg 3
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // relative bar: mean degree = 2·8/6 = 2.67 → k = (2·8·4) DIV (6·5) = 2;
    // 6 peels round 1, stranding 5 at deg 1 → peels round 2, K4 remains
    val rel = Graph.kcoreMeanFrac(pairs, num = 4, den = 5, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(rel == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cooccurrenceTopK: hand-computed Jaccard, minCo prune, rank ties on id") {
    // baskets: {1,2,3} ×2, {1,2} ×1, {3,4} ×1 →
    //   co(1,2)=3, co(1,3)=2, co(2,3)=2, co(3,4)=1 (pruned at minCo=2)
    //   deg: 1→3, 2→3, 3→3, 4→1
    val rows = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L),
      (103L, 3L), (103L, 4L)
    ).toDF("basket", "item")
    val got = Graph.cooccurrenceTopK(rows, "basket", "item", k = 2, minCo = 2L)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._4) -> ((r._2, r._3))).toMap
    // jaccard(1,2) = 3/(3+3-3) = 1.0 → 1000000
    // jaccard(1,3) = 2/(3+3-2) = 0.5 → 500000 (same for (2,3))
    assert(got(1L -> 1) == ((2L, 1000000L)))
    assert(got(1L -> 2) == ((3L, 500000L)))
    assert(got(2L -> 1) == ((1L, 1000000L)))
    assert(got(2L -> 2) == ((3L, 500000L)))
    // item 3: two 500000 ties → smaller neighbor id first
    assert(got(3L -> 1) == ((1L, 500000L)))
    assert(got(3L -> 2) == ((2L, 500000L)))
    // item 4's only pair was pruned by minCo
    assert(!got.keySet.exists(_._1 == 4L))
  }

  test("cooccurrenceTopK: maxBasket drops a planted mega-basket, small " +
    "baskets keep their exact top-k") {
    // a bot basket with 10⁴ items would explode ~5·10⁷ pairs; the cap
    // drops the whole group before the set is collected
    val mega = (1L to 10000L).map(i => (999L, i))
    val small = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L),
      (103L, 3L), (103L, 4L))
    val rows = (small ++ mega).toDF("basket", "item")
    val capped = Graph.cooccurrenceTopK(rows, "basket", "item",
      k = 2, minCo = 2L, maxBasket = 100)
      .as[(Long, Long, Long, Int)].collect().toSet
    // identical to running on the small baskets alone: the mega-basket
    // contributes neither co-occurrence nor degree
    val smallOnly = Graph.cooccurrenceTopK(small.toDF("basket", "item"),
      "basket", "item", k = 2, minCo = 2L, maxBasket = 100)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(capped == smallOnly && capped.nonEmpty)
    // and with the cap lifted (smaller planted basket so the quadratic
    // explode stays test-sized), the degrees shift — proving the cap is
    // what isolated the small baskets from the bot basket
    val rows300 = (small ++ (1L to 300L).map(i => (999L, i))).toDF("basket", "item")
    val uncapped = Graph.cooccurrenceTopK(rows300, "basket", "item",
      k = 2, minCo = 2L, maxBasket = Int.MaxValue)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(uncapped != capped)
  }
}
