package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over an edge list — the corpus-graph
  * centrality primitive (page/domain authority for web-corpus curation,
  * citation weight, entity salience).
  *
  * Deterministic by construction: ranks live in integer nano-units
  * (start 10⁹ per node) and one iteration is
  *   r'(v) = 0.15·10⁹  +  Σ_{u→v} (r(u)·17) DIV (20·deg(u))
  * — damping 0.85 as the exact rational 17/20, floor division, integer
  * sums. No doubles anywhere, so results are identical on any cluster
  * shape AND replayable by a plain SQL engine (the oracle unrolls the
  * same iterations as chained CTEs). The ≤20·deg(u) nano-units lost to
  * each floor are the price of exactness; after the fixed iteration
  * count they perturb ranks far below the ranking grain.
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * rank frame on src (shuffle on the node key — co-partitioned for free
  * when both sides are bucketed by node), then one map-combined sum at
  * the dst grain. Lineage is truncated with lazy localCheckpoints
  * (Clustering's pattern) so the fixed-iteration loop stays one job.
  * Dangling nodes cannot occur: callers pass UNDIRECTED edges (both
  * directions), so deg ≥ 1 for every node in the frame.
  */
object Graph {

  /** Undirected edge list (both directions) from a bipartite relation. */
  def undirectedEdges(rel: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = rel.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
  }

  /** (node, deg, r) after `iters` power iterations, r in nano-units. */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // degree is folded into the edge frame ONCE — each iteration is then
    // a single equi-join (ranks ⋈ out-edges) + one map-combined sum,
    // not a second join against the degree table every round
    val e = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"), col("deg")).distinct()
      .localCheckpoint(eager = false)
    var ranks = nodes.select(col("node"), lit(1000000000L).as("r"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      ranks = e
        .join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("(r * 17) DIV (20 * deg)").as("c"))
        .groupBy(col("dst"))
        .agg((lit(150000000L) + sum(col("c"))).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint(eager = false)
    }
    ranks.join(nodes, Seq("node"))
      .select(col("node"), col("deg"), col("r"))
  }
}
