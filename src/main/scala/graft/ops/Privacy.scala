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

  /** t-closeness profile (Li et al., ICDE 2007) — the third leg of the
    * anonymity triad: a class can be k-anonymous AND l-diverse yet still
    * leak because its sensitive-value DISTRIBUTION differs sharply from
    * the table's. For an ORDERED sensitive attribute pre-bucketed into
    * `bucket`, the class-vs-global distance is the Earth Mover's
    * Distance, which on an ordered domain is the mean absolute gap of
    * the cumulative shares:
    *   EMD_c = Σ_k |cum_c(k)/n_c − cum(k)/n| / (m−1).
    * Exact integers end to end: each gap is cross-multiplied to
    * |cum_ck·n − cum_k·n_c| over the common denominator n_c·n, summed,
    * and only the final ratio rounds (round4) — so results are
    * partitioning-invariant and SQL-replayable. (Cross-multiplied terms
    * are bounded by n_c·n; corpora beyond ~3·10⁹ rows per table should
    * bucket-partition the audit first.)
    *
    * Scale shape: one (quasi, bucket) map-combined aggregate over the
    * data, then all remaining work happens on the class × m grid (m =
    * global bucket count, a constant ~10): global cumulatives via the
    * triangular tiny-frame join (Drift.ksProfile's pattern — no global
    * window), per-class cumulatives via a broadcast of that m-row spine.
    * Output: one row per class — (quasi…, n_c, emd) with `max(emd)` the
    * table's t.
    */
  def tClosenessProfile(df: DataFrame, quasi: Seq[(String, Column)],
                        bucket: Column): DataFrame = {
    val qNames = quasi.map(_._1)
    val base = df.select(quasi.map { case (n, c) => c.as(n) } :+
      bucket.cast("long").as("s"): _*)
    // global bucket spine with exact cumulative counts (tiny frame)
    val g = base.groupBy(col("s")).agg(count(lit(1)).as("n_k"))
    val cumG = g.select(col("s").as("k"))
      .join(g.select(col("s").as("s2"), col("n_k").as("c2")), col("s2") <= col("k"))
      .groupBy(col("k")).agg(sum(col("c2")).as("cum_k"))
    val tot = base.agg(count(lit(1)).as("n"),
      countDistinct(col("s")).as("m"))
    val spine = cumG.crossJoin(broadcast(tot)).localCheckpoint(eager = false)
    // per-(class, bucket) counts, then the class × m grid
    val cls = base.groupBy(qNames.map(col) :+ col("s"): _*)
      .agg(count(lit(1)).as("n_cs"))
      .localCheckpoint(eager = false)
    val classes = cls.groupBy(qNames.map(col): _*)
      .agg(sum(col("n_cs")).as("n_c"))
    val grid = classes.crossJoin(broadcast(spine))
    // cum_ck = Σ_{s ≤ k} n_cs — broadcasting the per-class counts would
    // be wrong at scale (classes grow with the table); join keyed on the
    // quasi columns instead, inequality on the constant bucket axis.
    // Renamed projection of cls: grid derives from cls, and a two-sided
    // op over shared lineage trips DetectAmbiguousSelfJoin otherwise.
    val clsR = cls.select(qNames.map(n => col(n).as(s"r_$n")) :+
      col("s").as("r_s") :+ col("n_cs").as("r_n_cs"): _*)
    val cumC = grid.join(clsR,
        qNames.map(n => grid(n) === clsR(s"r_$n")).reduce(_ && _) &&
          clsR("r_s") <= grid("k"), "left")
      .groupBy(qNames.map(grid(_)) :+ grid("k") :+ grid("n_c") :+
        grid("cum_k") :+ grid("n") :+ grid("m"): _*)
      .agg(coalesce(sum(col("r_n_cs")), lit(0L)).as("cum_ck"))
    cumC
      .withColumn("term", abs(col("cum_ck") * col("n") - col("cum_k") * col("n_c")))
      .groupBy(qNames.map(col) :+ col("n_c") :+ col("n") :+ col("m"): _*)
      .agg(sum(col("term")).as("num"))
      .select(qNames.map(col) :+ col("n_c") :+
        when(col("m") === 1, lit(0.0)) // one bucket: every class matches globally
          .otherwise(graft.text.TextAnalysis.round4(
            col("num") / ((col("m") - 1) * col("n_c") * col("n")))).as("emd"): _*)
  }

  /** Geometric-mechanism (discrete-Laplace) differentially-private counts
    * (Ghosh–Roughgarden–Sundararajan 2009): per-group count plus integer
    * noise X₁ − X₂, the Xᵢ independent Geometric(1/2) draws — the
    * two-sided geometric with α = 1/2, an ε = ln 2 release for counting
    * queries (sensitivity 1), clamped at 0 for publishable counts.
    *
    * Noise is inverse-CDF over md5-uniform bits: Geometric(1/2) is the
    * leading-ones count of an independent 32-bit hash word, computed as
    * 32 − length(bin(¬h)) — pure integer, engine-exact, no libm. Draws
    * are seeded by (seed, group) so a release is reproducible for audit
    * and SQL-replayable; a production release swaps the seed source for
    * real entropy at publish time (the mechanism is unchanged). An
    * actual export ships `dp_count` ONLY — `true_count`/`noise` ride
    * along here because this is the mechanism's audit surface.
    *
    * Scale: one map-combined count aggregate; the noise is a per-GROUP
    * scalar expression — no extra shuffle, no extra pass, at any size.
    *
    * PRESENCE CAVEAT (standard for the geometric mechanism over an
    * unbounded group domain): rows are emitted only for groups PRESENT
    * in the data, so group membership itself leaks exactly — the ε = ln 2
    * accounting covers the counts, not the key set. Use this overload
    * only when the key set is public / pre-enumerated; otherwise pass a
    * public domain frame to the 4-arg overload below, which left-joins
    * the domain so absent groups release a noised zero.
    */
  def dpGeometricCounts(df: DataFrame, groupCol: String,
                        seed: String): DataFrame = {
    def geo(salt: String): Column = {
      val h = conv(substring(
        md5(concat(lit(s"$seed|$salt|"), col("grp").cast("string"))),
        1, 8), 16, 10).cast("long")
      val c = lit(4294967295L) - h // bitwise NOT within the 32-bit word
      when(c === 0, lit(32)).otherwise(lit(32) - length(bin(c)))
    }
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noise", (geo("a") - geo("b")).cast("long"))
      .withColumn("dp_count",
        greatest(lit(0L), col("true_count") + col("noise")))
  }

  /** [[dpGeometricCounts]] over a PUBLIC pre-enumerated domain: every
    * `domain` key gets a row — groups absent from the data release a
    * noised zero, so presence/absence no longer leaks (the release is
    * indistinguishable between a zero-count and a missing group). Data
    * groups OUTSIDE the domain are dropped (releasing surprise keys
    * would reintroduce the presence channel). The domain is assumed
    * dimension-sized and is broadcast; noise stays the per-group scalar
    * expression — still one count aggregate, no extra shuffle.
    */
  def dpGeometricCounts(df: DataFrame, groupCol: String, seed: String,
                        domain: DataFrame): DataFrame = {
    val dom = domain.select(col(domain.columns.head).as("grp")).distinct()
      .localCheckpoint(eager = false) // read twice: gate join + zero-fill
    // out-of-domain rows drop at the SCAN (broadcast inner semi — no
    // shuffle of the fact side beyond the count agg it needs anyway), so
    // the count table is domain-bounded and itself broadcastable below
    val counted = df.select(col(groupCol).as("d_grp"))
      .join(broadcast(dom), col("d_grp") === col("grp"), "left_semi")
      .groupBy(col("d_grp")).agg(count(lit(1)).as("d_n"))
    def geo(salt: String): Column = {
      val h = conv(substring(
        md5(concat(lit(s"$seed|$salt|"), col("grp").cast("string"))),
        1, 8), 16, 10).cast("long")
      val c = lit(4294967295L) - h
      when(c === 0, lit(32)).otherwise(lit(32) - length(bin(c)))
    }
    dom.join(broadcast(counted), col("grp") === col("d_grp"), "left")
      .select(col("grp"), coalesce(col("d_n"), lit(0L)).as("true_count"))
      .withColumn("noise", (geo("a") - geo("b")).cast("long"))
      .withColumn("dp_count",
        greatest(lit(0L), col("true_count") + col("noise")))
  }

  /** Differentially-private quantiles by POST-PROCESSING a DP histogram:
    * the only ε-bearing step is one [[dpGeometricCounts]] release over the
    * PUBLIC bucket domain `[0, nBuckets)` (disjoint buckets → parallel
    * composition, so the whole histogram is one ε = ln 2 release); each
    * requested percentile is then the first bucket whose released
    * cumulative reaches ⌈pct·total/100⌉ — a function of the released
    * counts alone, so it costs no additional privacy (post-processing
    * invariance, Dwork–Roth Prop. 2.1). The bucket GRID must be public
    * (a fixed value ladder, like [[generalizeToK]]'s $-buckets); rows
    * whose bucket falls outside it are dropped by the domain gate.
    *
    * All arithmetic is integer (geometric noise, clamped counts, ceil
    * division), so a release replays bit-exactly in any engine from
    * (seed, grid) alone.
    *
    * Scale (100 TB): the histogram is ONE map-combined count over the
    * public buckets; everything downstream — cumulative (triangular join),
    * total, percentile selection — works the ≤`nBuckets`-row release
    * frame, broadcast everywhere. No global window, no second pass over
    * the data, at any corpus size.
    */
  def dpHistogramQuantiles(df: DataFrame, bucketCol: String, seed: String,
                           nBuckets: Int, pcts: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(nBuckets >= 1 && nBuckets <= 65536,
      "nBuckets in [1, 65536] — the release frame is broadcast downstream")
    // a silent drop of an out-of-range pct would release FEWER quantiles
    // than asked for — refuse instead
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1, 100], got $pcts")
    val domain = spark.range(nBuckets.toLong).toDF("b")
    // the ε-bearing step: one geometric-mechanism histogram release.
    // Checkpointed: the cumulative and the total both branch off it, and
    // without this the corpus-scan count subtree would run twice.
    val hist = dpGeometricCounts(df, bucketCol, seed, domain)
      .select(col("grp").cast("long").as("b"), col("dp_count"))
      .localCheckpoint(eager = false)
    // released cumulative: one running-sum window over the ≤nBuckets-row
    // release frame — single-partition by construction and bounded by the
    // require above, same posture as the stats_quantile_hist bucket
    // window (the triangular join this replaces was nBuckets²/2 rows —
    // 2.1e9 at the 65536 bound)
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.select(col("b").as("cb"),
      sum(col("dp_count")).over(wc).as("cum"))
    val tot = hist.agg(sum(col("dp_count")).as("tot"))
    pcts.toDF("pct").crossJoin(broadcast(tot))
      .withColumn("target", expr("(tot * pct + 99) DIV 100"))
      .join(broadcast(cum), col("cum") >= col("target"))
      .groupBy(col("pct")).agg(min(col("cb")).as("bucket"))
  }
}
