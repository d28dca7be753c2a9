package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dominant direction of the mean-centered embedding cloud by power
  * iteration on the second-moment matrix — the "all-but-the-top"
  * (Mu & Viswanath 2018) post-processing step: real embedding sets carry
  * a large common component that swamps cosine similarity; subtracting
  * the top direction is the standard fix before ANN/dedup.
  *
  * Never materializes the d×d covariance: one iteration is the two
  * matvecs r = Cv and w = Cᵀr over the exploded (id, pos, x) frame —
  * two shuffled aggregations (id grain, then pos grain), linear in
  * corpus size, d-row state broadcast back. This is how the step runs
  * at 100 TB; a local eigensolver cannot.
  *
  * Determinism budget (everything replayable in any engine):
  *  - all values are scaled integers; every division is
  *    floor(exact-integer ÷ exact-integer) computed in doubles, with
  *    operands PROVABLY ≤ 2⁵³ so the doubles are exact and the IEEE
  *    division + floor are bit-identical across engines. (Spark's DIV
  *    truncates toward zero while DuckDB's // floors — centering makes
  *    values negative, so integer-division operators would diverge.)
  *  - per-dim mean μ_d = ⌊Σx/n + ½⌋ (micro-units, |c| = |x−μ| ≤ 2²¹)
  *  - v carries 2²⁰ scale; r_j = Σ_d c·v ≤ 2⁴⁷; rs = ⌊r/2³⁴⌋ ≤ 2¹³;
  *    w_d = Σ_j c·rs ≤ n·2³⁴ (exact for n ≤ 2¹⁹ rows per shard);
  *    ws = ⌊w/2²⁰⌋; v' = ⌊ws·2²⁰ / max(max|ws|, 1)⌋ — renormalized to
  *    2²⁰ scale each round, sign fixed by construction of the start.
  */
object PowerIter {

  private def fdiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** (pos, mu, v): per-dimension integer mean (micro-units) and the
    * dominant-direction coordinate at 2²⁰ scale, after `iters` rounds
    * from the all-equal start vector.
    */
  def topDirection(emb: DataFrame, iters: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ex = emb.select(col(idCol).as("id"), posexplode(
        transform(col(vecCol), x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))))
      .select(col("id"), col("pos"), col("col").as("x"))
      .localCheckpoint(eager = false)
    val mu = ex.groupBy(col("pos"))
      .agg(floor(sum(col("x")) / count(lit(1)) + lit(0.5)).cast("long").as("mu"))
      .localCheckpoint(eager = false)
    // NOTE (r14): no pre-partition before the checkpoint — the
    // checkpointed scan reads back UnknownPartitioning(0) (refuted by the
    // r13 committed plans), so repartition(id) was a wasted full shuffle;
    // each round re-exchanges regardless.
    val c = ex.join(broadcast(mu), Seq("pos"))
      .select(col("id"), col("pos"), (col("x") - col("mu")).as("xc"))
      .localCheckpoint(eager = false)
    var v = mu.select(col("pos"), lit(1048576L).as("v"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val r = c.join(broadcast(v), Seq("pos"))
        .groupBy(col("id"))
        .agg(sum(col("xc") * col("v")).as("r"))
        .select(col("id"), fdiv(col("r"), lit(17179869184L)).as("rs")) // 2^34
      val w = c.join(r, Seq("id"))
        .groupBy(col("pos"))
        .agg(sum(col("xc") * col("rs")).as("w"))
        .select(col("pos"), fdiv(col("w"), lit(1048576L)).as("ws"))
      val mx = w.agg(greatest(max(abs(col("ws"))), lit(1L)).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("pos"),
          fdiv(col("ws") * lit(1048576L), col("mx")).as("v"))
        .localCheckpoint(eager = false)
    }
    mu.join(v, Seq("pos")).select(col("pos"), col("mu"), col("v"))
  }
}
