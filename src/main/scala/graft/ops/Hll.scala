package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) with 256
  * registers, built deterministically from md5 so the whole sketch —
  * register table AND estimate — replays bit-for-bit in any engine with
  * md5 (the DuckDB hash gate covers it, which no engine-native HLL can).
  *
  * Two determinism choices that differ from a textbook float HLL:
  *
  *  - The harmonic denominator Σ 2^(−M_j) is accumulated as the EXACT
  *    integer Σ 2^(33−M_j) (scaled by 2³³; every term is a power of two,
  *    M_j ≤ 33). Double summation order varies with partitioning; integer
  *    sums do not, so the estimate is identical on any cluster shape.
  *  - The small-range linear-counting correction (m·ln(m/V₀)) is NOT
  *    folded into the hashed estimate: ln drifts in the last ulp across
  *    libm implementations (same reason LmScore scores in whole bits).
  *    The `zeros` column carries V₀ so callers can apply the correction —
  *    a per-group scalar — outside the exact-replay boundary.
  *
  * Scale: one shuffle to the (group, register) grain — 256 rows per group
  * ceiling regardless of input size — then a per-group rollup. Register
  * tables merge across corpora by max, the defining HLL property.
  */
object Hll {

  val Registers = 256 // p = 8 index bits
  /** α₂₅₆ · m² · 2³³ — the estimate numerator, precomputed so both the
    * Spark and SQL sides perform ONE double division by the integer
    * denominator (no order-of-operations drift).
    */
  val EstNumerator: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 8589934592.0

  /** Register index (md5 bytes 0-3) and rank ρ = leading-zeros+1 of the
    * independent 32-bit word in md5 bytes 4-7 (ρ ∈ [1,33]; an all-zero
    * word counts the full 32 zeros). bin() renders without leading
    * zeros in Spark and DuckDB alike, so 33 − bitlen is exact in both.
    */
  private def h32(v: Column, from: Int): Column =
    conv(substring(md5(v.cast("string")), from, 8), 16, 10).cast("long")

  def registers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val rho = when(h32(v, 9) === 0, lit(33))
      .otherwise(lit(33) - length(bin(h32(v, 9))))
    df.select(col(groupCol).as("grp"),
        pmod(h32(v, 1), lit(Registers)).as("idx"), rho.as("rho"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("mreg"))
  }

  /** Per-group estimate row: (grp, v_used, zeros, sum_scaled, est).
    * est = ⌊α·m²·2³³ / Σ 2^(33−M_j) + ½⌋ with absent registers
    * contributing 2³³ (M_j = 0).
    */
  def estimate(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    registers(df, groupCol, valueCol)
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("int").as("v_used"),
        sum(expr("shiftleft(cast(1 as bigint), cast(33 - mreg as int))")).as("sum_present"))
      .select(col("grp"), col("v_used"),
        (lit(Registers) - col("v_used")).as("zeros"),
        (col("sum_present") + (lit(Registers.toLong) - col("v_used")) * lit(8589934592L))
          .as("sum_scaled"))
      .withColumn("est",
        floor(lit(EstNumerator) / col("sum_scaled") + lit(0.5)).cast("long"))
      .drop("sum_present")

  /** Sliding-window distinct estimate: per tick t, the HLL estimate over
    * ticks (t−width, t] — register tables merge by MAX, so a trailing
    * window of sketches is one window-function pass over a DENSE
    * (tick × register) grid (absent registers must still slide, hence the
    * grid; it is ticks·256 rows — kilobytes — regardless of input size).
    * The window frame is RANGE-based on the integer tick, so gaps in the
    * tick sequence exclude expired registers exactly.
    *
    * This is the streaming-dashboard shape ("distinct users, trailing 3
    * h") computed in batch: one shuffle to (tick, register), one
    * 256-partition window pass, one per-tick rollup.
    */
  def slidingEstimate(df: DataFrame, tickCol: String, valueCol: String,
                      width: Int): DataFrame = {
    val reg = registers(df, tickCol, valueCol)
      .select(col("grp").as("h"), col("idx"), col("mreg"))
    val dense = reg.select(col("h")).distinct()
      .select(col("h"),
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(255 AS BIGINT))")).as("idx"))
      .join(reg, Seq("h", "idx"), "left")
    val w = Window.partitionBy(col("idx")).orderBy(col("h"))
      .rangeBetween(1L - width, 0L)
    dense.select(col("h"), max(col("mreg")).over(w).as("m"))
      .groupBy(col("h"))
      .agg(count(col("m")).cast("int").as("v_used"),
        sum(when(col("m").isNotNull,
          expr("shiftleft(cast(1 as bigint), cast(33 - m as int))"))).as("sum_present"))
      .select(col("h"), col("v_used"),
        (lit(Registers) - col("v_used")).as("zeros"),
        (coalesce(col("sum_present"), lit(0L)) +
          (lit(Registers.toLong) - col("v_used")) * lit(8589934592L)).as("sum_scaled"))
      .withColumn("est",
        floor(lit(EstNumerator) / col("sum_scaled") + lit(0.5)).cast("long"))
  }
}
