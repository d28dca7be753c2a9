package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — Efron's bootstrap at corpus scale (Chamandy,
  * Muralidharan, Najmi & Naidu, "Estimating uncertainty for massive
  * data streams", Google TR 2012). A classical bootstrap replicate
  * resamples n rows WITH replacement, which a distributed engine cannot
  * do (it needs a global index and n draws per replicate); but each
  * row's multiplicity in a replicate is Binomial(n, 1/n) → Poisson(1)
  * as n grows, so every row instead draws an INDEPENDENT Poisson(1)
  * weight per replicate. One scan, R map-side weight draws per row,
  * and the per-replicate means fold through one map-combined aggregate
  * — no global state, no second pass, at any corpus size.
  *
  * Draws are md5-seeded inverse-CDF: u = first 8 md5 hex digits of
  * (seed|replicate|id) as a 32-bit integer, and the weight is the
  * number of EXCEEDED cumulative cuts `floor(CDF_Poisson(1)(k)·2³²)`
  * (k = 0..7, truncating the ~1e-6 tail mass at 8 — identically on
  * both engines). Pure integer arithmetic end to end, so a DuckDB
  * oracle replays every draw bit-for-bit, and a re-run on any cluster
  * shape reproduces the same replicate means.
  */
object Bootstrap {

  /** floor(P(Poisson(1) ≤ k) · 2³²) for k = 0..7. */
  val poissonCuts: Seq[Long] = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Poisson(1) weight from a 32-bit uniform column. */
  def poissonWeight(u: Column): Column =
    poissonCuts.map(c => when(u >= c, 1L).otherwise(0L)).reduce(_ + _)

  /** 32-bit md5 uniform for a (seed, replicate, id) draw — the shared
    * randomness source of every bootstrap release here (SQL-replayable:
    * first 8 md5 hex digits of `seed|rep|id`).
    */
  def uniform32(seed: String, rep: Column, id: Column): Column =
    conv(substring(md5(concat(lit(s"$seed|"), rep.cast("string"),
      lit("|"), id.cast("string"))), 1, 8), 16, 10).cast("long")

  /** Per-replicate WEIGHTED bucket histogram (rep, bucket, n) — the
    * reusable grain for bootstrap quantiles: resampled order statistics
    * fold from one scan into R tiny histograms; quantile selection then
    * runs per-replicate windows over the bucket frame (partitioned by
    * rep — never a corpus-grain sort).
    */
  def poissonBucketCounts(df: DataFrame, idCol: String, bucketCol: String,
                          replicates: Int, seed: String): DataFrame = {
    require(replicates >= 1 && replicates <= 1024, "replicates in [1, 1024]")
    df.select(col(idCol), col(bucketCol).cast("long").as("bkt"))
      .withColumn("rep", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("w", poissonWeight(uniform32(seed, col("rep"), col(idCol))))
      .groupBy(col("rep"), col("bkt"))
      .agg(sum(col("w")).as("n"))
      .filter(col("n") > 0)
      .select(col("rep").cast("int").as("rep"), col("bkt"), col("n"))
  }

  /** Per-replicate bootstrap means of an integer-valued column:
    * (rep, n_eff, mean_micro) — mean in micro-units of `valueCol`
    * (`sum·10⁶ DIV n_eff`, exact integer). The spread of the R means IS
    * the sampling uncertainty of the corpus mean; quantiles of this
    * R-row frame give the CI (post-processing of a tiny frame).
    * Replicates whose total weight is zero are dropped (possible only
    * for degenerate ≤ a-few-row inputs).
    */
  def poissonMeans(df: DataFrame, idCol: String, valueCol: String,
                   replicates: Int, seed: String): DataFrame = {
    require(replicates >= 1 && replicates <= 1024, "replicates in [1, 1024]")
    df.select(col(idCol), col(valueCol).cast("long").as("x"))
      .withColumn("rep", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("w", poissonWeight(uniform32(seed, col("rep"), col(idCol))))
      .groupBy(col("rep"))
      // the replicate sum accumulates in decimal(38,0): a 10¹²-row
      // corpus of ~10⁷-unit values overflows int64 (DuckDB's HUGEINT
      // matches); the released mean_micro is back in int64 range
      .agg(sum(col("w")).as("n_eff"),
        sum((col("w") * col("x")).cast("decimal(38,0)")).as("s"))
      .filter(col("n_eff") > 0)
      .select(col("rep").cast("int").as("rep"), col("n_eff"),
        expr("CAST((s * 1000000) DIV n_eff AS BIGINT)").as("mean_micro"))
  }
}
