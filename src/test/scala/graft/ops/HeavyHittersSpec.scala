package graft.ops

import graft.SparkSpec
import graft.functions.{cdc_chunks, misra_gries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: item w_i appears 3000/i times, order pseudo-shuffled
    * deterministically (sort by md5 of position) so partitions see a
    * realistic interleaving rather than runs of one item.
    */
  private lazy val zipf: Seq[String] = {
    val raw = (1 to 50).flatMap(i => Seq.fill(3000 / i)(s"w$i"))
    raw.zipWithIndex
      .sortBy { case (_, pos) =>
        java.util.Arrays.hashCode(java.security.MessageDigest
          .getInstance("MD5").digest(pos.toString.getBytes)) -> pos
      }
      .map(_._1)
  }

  test("misra_gries keeps every item above n/(k+1) under any partitioning") {
    val n = zipf.size
    val k = 10
    val exact = zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val guaranteed = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(guaranteed.nonEmpty && guaranteed.size < exact.size,
      "fixture must exercise both survivors and evictions")
    for (parts <- Seq(1, 3, 7, 16)) {
      val rows = zipf.toDF("item").repartition(parts)
        .agg(misra_gries(col("item"), k).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect()
      val ests = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ests.size <= k, s"parts=$parts: more than k counters survived")
      guaranteed.foreach { item =>
        assert(ests.contains(item), s"parts=$parts: lost guaranteed item $item")
      }
      // MG error bound: true - n/(k+1) <= est <= true
      ests.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t, s"parts=$parts: overestimate for $item")
        assert(est >= t - n / (k + 1), s"parts=$parts: est too low for $item")
      }
    }
  }

  test("heavyHitters output is the exact > n/(k+1) set, partition-independent") {
    val n = zipf.size
    val k = 10
    val exact = zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.filter { case (_, c) => c * (k + 1) > n }.toSeq
      .sortBy { case (item, c) => (-c, item) }
    for (parts <- Seq(1, 5, 16)) {
      val got = HeavyHitters
        .heavyHitters(zipf.toDF("item").repartition(parts), "item", k)
        .as[(String, Long)].collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("misra_gries aggregates map-side (partial before the exchange)") {
    val df = zipf.toDF("item").repartition(4)
      .agg(misra_gries(col("item"), 10).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_misra_gries"),
      s"expected map-side partial misra_gries in:\n$plan")
  }

  test("cdc_chunks concatenates back to the input and is offset-robust") {
    val base = "the quick brown fox jumps over the lazy dog " * 30
    val Seq(chunks) = Seq(base).toDF("s")
      .select(cdc_chunks(col("s"), 16).as("c")).as[Seq[String]].collect().toSeq
    assert(chunks.mkString == base, "chunks must partition the input")
    assert(chunks.size >= 3, "fixture must produce several chunks")

    // content-defined resync: prefixing unrelated text shifts every byte
    // offset, but every boundary of `base` at char >= 16 survives in the
    // prefixed string — so base's chunks after its first boundary are a
    // contiguous SUFFIX of the prefixed string's chunks
    val Seq(shifted) = Seq("UNRELATED-PREFIX-123 " + base).toDF("s")
      .select(cdc_chunks(col("s"), 16).as("c")).as[Seq[String]].collect().toSeq
    val tail = chunks.drop(1)
    assert(shifted.takeRight(tail.size) == tail,
      "chunking must resynchronize after an offset shift")

    // degenerate inputs: shorter than the window -> one chunk; empty -> none
    val small = Seq("short", "").toDF("s")
      .select(cdc_chunks(col("s"), 16).as("c")).as[Seq[String]].collect()
    assert(small(0) == Seq("short") && small(1).isEmpty)
  }
}
