package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utility (SURVEY §4 "salt large bags"): an equi-join
  * where a few hot keys dominate (one consignment with millions of files,
  * one near-dup cluster with most of the corpus) overloads single reducers
  * at cluster scale. Salting fans each hot key into `salts` subkeys: the
  * skewed side gets a random salt, the other side is replicated across all
  * salts, then the join runs on (key, salt).
  *
  * AQE's skew-join split handles sort-merge cases adaptively; explicit
  * salting remains the tool when the skew is known a priori or the join
  * is produced by an operator AQE can't split (e.g. a grouped aggregate
  * feeding the join).
  */
object Skew {

  /** Inner equi-join `left.key == right.key` with the LEFT side salted.
    * Deterministic salt (hash of the row's salt-source column mod salts)
    * so retries/oracles reproduce.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, saltSource: String): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(col(saltSource)), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-tolerant aggregation: partial per (key, salt), then
    * final per key — the classic map-side-combine generalization for
    * count/sum-style aggregates whose partials merge.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int,
                  saltSource: String): DataFrame =
    df.withColumn("_salt", pmod(hash(col(saltSource)), lit(salts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
}
