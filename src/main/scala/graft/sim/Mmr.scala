package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
  * greedily pick k vectors maximizing λ·relevance − (1−λ)·max-similarity
  * -to-already-selected — the standard recipe for a diverse eval/probe
  * subset that plain top-k-by-relevance ruins with near-duplicates.
  *
  * Execution shape: k driver rounds; each round is ONE map-combined
  * argmax aggregate over the candidate frame (max of a (score, -id)
  * struct — no sort, no window), plus a 1-row fetch of the winner's
  * vector. The ≤k selected vectors ride into the next round as array
  * LITERALS inside the scoring projection, so the corpus-side work is a
  * pure columnar scan — nothing joins, nothing shuffles but the
  * aggregate's kilobyte partials. At 100 TB: k scans of the candidate
  * frame (localCheckpointed once), each embarrassingly parallel.
  *
  * Determinism: relevance and similarities are micro-unit-rounded dots
  * (sequential double accumulation, see DotProductExpr), scores are
  * exact integers (λ in tenths), ties break toward the smaller id.
  */
object Mmr {

  /** Returns (rank, vec_id, score) for the k selected vectors, where
    * score = lambdaTenths·rel_µ − (10−lambdaTenths)·maxSim_µ at selection
    * time (round 1 has no similarity term). Relevance is the dot with the
    * min-id probe vector.
    */
  def selectDiverse(emb: DataFrame, k: Int, lambdaTenths: Int = 7,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && lambdaTenths >= 0 && lambdaTenths <= 10)
    val spark = emb.sparkSession
    val probe = emb.orderBy(col(idCol)).select(col(vecCol)).head().getSeq[Float](0)
    val muDot = (v: Seq[Float]) =>
      floor(graft.functions.dot_product(col("v"), typedlit(v)) * lit(1000000.0)
        + lit(0.5)).cast("long")
    val base = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"), muDot(probe).as("rel"))
      .localCheckpoint(eager = false)
    var selected = Vector.empty[(Long, Seq[Float], Long)] // (id, vec, score)
    for (_ <- 1 to k) {
      val cand =
        if (selected.isEmpty) base
        else base.filter(!col("id").isInCollection(selected.map(_._1)))
      val maxSim =
        if (selected.isEmpty) lit(0L)
        else selected.map(s => muDot(s._2)).reduce((a, b) => greatest(a, b))
      val score = lit(lambdaTenths.toLong) * col("rel") -
        lit((10 - lambdaTenths).toLong) * maxSim
      val top = cand.agg(max(struct(score.as("s"), (-col("id")).as("nid")))
        .as("t")).head().getStruct(0)
      val (sc, id) = (top.getLong(0), -top.getLong(1))
      val vec = base.filter(col("id") === id).select(col("v"))
        .head().getSeq[Float](0)
      selected :+= ((id, vec, sc))
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, sc), i) => (i + 1, id, sc) }
      .toDF("rank", "vec_id", "score")
  }
}
