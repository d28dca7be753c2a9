package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for shareable derived datasets: k-anonymity
  * equivalence-class analysis and a generalization ladder that coarsens
  * quasi-identifiers until every class reaches the target k.
  *
  * A training-data pipeline that exports per-customer aggregates needs to
  * know whether the quasi-identifier combination (location, segment,
  * balance bucket) isolates individuals. k-anonymity (Sweeney 2002) is the
  * standard audit: every row must share its quasi-identifier tuple with at
  * least k-1 others.
  *
  * Scale (100 TB): the class histogram is two map-combined hash aggregates
  * (rows → classes → class-size histogram); the ladder probe is one
  * aggregate per rung with a constant number of rungs — no joins, no
  * windows, nothing quadratic. Works unchanged on a 1000-executor cluster
  * because the shuffle grain is the quasi-identifier tuple, whose
  * cardinality shrinks as generalization coarsens.
  */
object Privacy {

  /** Equivalence-class size histogram: for each class size, how many
    * quasi-identifier classes have it and how many rows they cover.
    * `min(class_size)` over the result IS the dataset's k-anonymity level.
    */
  def kAnonymityHistogram(df: DataFrame, quasi: Seq[Column]): DataFrame =
    df.groupBy(quasi: _*).agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))

  /** l-diversity histogram (Machanavajjhala et al. 2007): per
    * quasi-identifier class, the number of DISTINCT sensitive values,
    * rolled up into a (l, n_classes, n_rows) histogram — `min(l)` over
    * the result IS the dataset's l-diversity level. The complement to
    * k-anonymity: a class can hold k rows yet leak the sensitive
    * attribute outright when all k share one value. Same map-combined
    * aggregate shape; the distinct is at the (class, sensitive) grain.
    */
  def lDiversityHistogram(df: DataFrame, quasi: Seq[Column],
                          sensitive: Column): DataFrame =
    df.groupBy(quasi: _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("class_size"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))

  /** One generalization rung: a named projection of the quasi-identifier
    * set at some coarseness. All rungs must render to the same schema
    * (string quasi columns) so the chosen rung is export-stable.
    */
  final case class Rung(name: String, quasi: Seq[(String, Column)])

  /** Climb the ladder (finest first) and return the first rung whose
    * minimum class size reaches `k`, with its class table. Each probe is
    * ONE map-combined aggregate job; the last rung should be coarse enough
    * to always satisfy k (full suppression in the limit). Driver state is
    * one Long per probe.
    */
  def generalizeToK(df: DataFrame, rungs: Seq[Rung], k: Long): (Rung, DataFrame) = {
    require(rungs.nonEmpty, "need at least one rung")
    val chosen = rungs.iterator.map { r =>
      val classes = df
        .groupBy(r.quasi.map { case (n, c) => c.as(n) }: _*)
        .agg(count(lit(1)).as("class_size"))
      (r, classes)
    }.find { case (_, classes) =>
      classes.agg(min(col("class_size"))).head().getLong(0) >= k
    }
    chosen match {
      case Some((r, classes)) => (r, classes)
      case None =>
        // caller's ladder never reached k — surface it loudly rather than
        // silently exporting a non-anonymous table
        throw new IllegalArgumentException(
          s"no rung of ${rungs.map(_.name)} reaches k=$k")
    }
  }
}
