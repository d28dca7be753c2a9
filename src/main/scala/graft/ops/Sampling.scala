package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. RNG-based
  * `df.sample` is neither reproducible across retries nor
  * oracle-checkable; these operators hash a stable key instead, so the
  * same row is always in or out of the sample — exactly what a 100 TB
  * pipeline wants for resumable, auditable subset selection.
  */
object Sampling {

  /** In-sample iff the first 4 md5 hex digits of the key fall under
    * `rate` (granularity 1/65536). Deterministic, uniform for hash-like
    * keys, portable to any engine with md5.
    */
  def hashSample(key: Column, rate: Double): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") <
      lit((rate * 65536).toInt)

  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashSample(col(keyCol), rate))

  /** Per-stratum rates (e.g. language balancing): strata absent from the
    * map keep `defaultRate`.
    */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10).cast("int") <
        (rateCol * 65536).cast("int"))
  }
}
