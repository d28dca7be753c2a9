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

  /** Target-mixture sampling (domain/language balancing for a training
    * corpus): derive per-stratum acceptance rates so sampled counts track
    * the target weights, scaled so the SCARCEST stratum (min n_l/w_l) is
    * used in full and everything else downsamples:
    * C = min_l n_l/w_l, rate_l = min(1, C·w_l/n_l). Strata outside the
    * weight map are dropped. The stratum-count aggregate collects
    * #strata rows to the driver — languages/sources, a handful by
    * construction, not data-scale.
    */
  def mixture(df: DataFrame, keyCol: String, stratumCol: String,
              weights: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratios = weights.collect {
      case (s, w) if w > 0 && counts.getOrElse(s, 0L) > 0L => counts(s) / w
    }
    require(ratios.nonEmpty,
      s"mixture: no weighted stratum present in the data " +
        s"(weights: ${weights.keys.mkString(",")}; observed: ${counts.keys.mkString(",")})")
    val c = ratios.min
    val rates = weights.map { case (s, w) =>
      s -> counts.get(s).filter(_ > 0).map(n => math.min(1.0, c * w / n)).getOrElse(0.0)
    }
    stratified(df, keyCol, stratumCol, rates, defaultRate = 0.0)
  }

  /** Deterministic global corpus shuffle: a salt-keyed md5 permutation
    * assigns every row a shuffle key, a hash shard, and a dense position
    * within its shard — the "shuffle the corpus before writing training
    * shards" step, reproducible across retries (same salt = same
    * permutation; new salt = fresh epoch order).
    *
    * Scale shape: one shuffle on the shard key + a per-shard sort — the
    * exact physical work writing sharded output needs anyway. No global
    * row-number (a single-partition bottleneck); position is per-shard.
    */
  def shuffleShards(df: DataFrame, id: Column, salt: String,
                    nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withKeys = df
      .withColumn("skey", md5(concat(lit(salt + ":"), id.cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("skey"), 1, 4), 16, 10).cast("long"),
          lit(nShards.toLong)))
    withKeys.withColumn("pos",
      row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), id))
        .cast("long") - 1)
  }

  /** Temperature-scaled mixture sampling (the multilingual-training
    * p_l ∝ n_l^α rebalance, here the common α = ½ "T=2" case): stratum
    * weights are INTEGER floor-sqrts of the observed counts — `sqrt` is
    * IEEE-correctly-rounded in every engine (unlike `pow`/`ln`, which
    * drift in the last ulp across libm builds and would flake the hash
    * gate), and flooring a correctly-rounded sqrt of a non-square can
    * never straddle an integer. Rates then follow the mixture rule
    * (scarcest-after-reweighting stratum in full, C = min n_l/w_l,
    * r_l = min(1, C·w_l/n_l)) on exactly-representable doubles. The
    * count aggregate collects #strata rows — languages, not data-scale.
    */
  def temperatureSqrt(df: DataFrame, keyCol: String,
                      stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSqrt: empty input")
    val weights = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble))
    }
    val c = counts.map { case (s, n) => n / weights(s) }.min
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, c * weights(s) / n)
    }
    stratified(df, keyCol, stratumCol, rates, defaultRate = 0.0)
  }

  /** Weighted sample-without-replacement via PRIORITY SAMPLING (Duffield,
    * Lund & Thorup 2007): each row gets priority q = w/u with u uniform
    * in (0,1], the k highest-priority rows are the sample, and the
    * (k+1)-th priority τ gives the unbiased subset-sum estimator
    * ŵ = max(w, τ) per sampled row.
    *
    * Chosen over the A-ES exponential race (key = u^(1/w)) deliberately:
    * u comes from the md5 permutation (u = (h+1)/2³², h 32-bit) and the
    * priority is ONE IEEE division of exactly-representable values —
    * bit-identical in every engine — where pow/ln keys drift in the last
    * ulp across libm implementations and would flake the hash gate.
    *
    * Scale shape: the k+1 survivors come out of the bounded-heap topk_by
    * aggregate (map-side partial, ≤k+1 rows per partition on the wire) —
    * no global sort, no window.
    */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u32 = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val pr = col(weightCol).cast("double") * lit(4294967296.0) /
      (u32 + lit(1L)).cast("double")
    val top = df
      .select(col(keyCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"), pr.as("pr"))
      .groupBy()
      .agg(graft.functions.topk_by(col("pr"), col("id"), k + 1).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.rank").as("rank"), col("t.nid").as("id"),
        col("t.sim").as("pr"))
      .localCheckpoint(eager = false)
    val tau = top.filter(col("rank") === k + 1)
      .select(col("pr").as("tau"))
    top.filter(col("rank") <= k)
      .join(df.select(col(keyCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w")), Seq("id"))
      .crossJoin(broadcast(tau))
      .select(col("rank"), col("id"), col("w"),
        graft.text.TextAnalysis.round4(col("pr")).as("pr_x"),
        graft.text.TextAnalysis.round4(greatest(col("w").cast("double"), col("tau")))
          .as("w_hat"))
  }

  /** Deterministic per-stratum reservoir: an exact-k uniform(-by-hash)
    * sample WITHOUT replacement from every group — the "k examples per
    * domain/language" inspection draw. The classic reservoir is a
    * sequential algorithm; its distributed equivalent is order-by-random-
    * key-take-k, which here rides the bounded-heap `topk_by` aggregate:
    * map-side partials keep ≤ k rows per partition per stratum on the
    * wire, no stratum-wide sort, no window — O(k) state per group at any
    * corpus size (vs. a `row_number` window that sorts whole strata).
    * The priority is the first 8 md5 hex digits of the key (u32 — exact
    * in the heap's Double), ties by smaller id; the same md5 family as
    * [[stratified]]/[[prioritySample]], so draws are reproducible and
    * SQL-replayable in any engine.
    */
  def reservoirPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
                          k: Int): DataFrame = {
    val hv = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.select(col(stratumCol).as("stratum"), col(keyCol).cast("long").as("id"),
        hv.as("hv"))
      .groupBy(col("stratum"))
      .agg(graft.functions.topk_by((-col("hv")).cast("double"), col("id"), k)
        .as("top"))
      .select(col("stratum"), explode(col("top")).as("t"))
      .select(col("stratum"), col("t.rank").as("rank"), col("t.nid").as("id"),
        (-col("t.sim")).cast("long").as("hv"))
  }
}
