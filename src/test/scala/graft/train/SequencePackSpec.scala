package graft.train

import graft.SparkSpec
import graft.text.SequencePack
import org.apache.spark.sql.functions._

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private val C = 16

  private def segs = {
    val docs = spark.range(200).select(
      $"id".as("doc_id"),
      // lengths 0..20 — includes zero-token docs (dropped) and docs
      // longer than one bin (must span)
      ($"id" * 13 % 21).cast("int").as("n_tok"))
    SequencePack.packSpans(docs, $"doc_id", $"n_tok", shards = 4, capacity = C)
  }

  test("every bin except each shard's last is exactly capacity full") {
    val stats = SequencePack.binStats(segs, C)
    val lastBin = stats.groupBy($"shard").agg(max($"bin").as("last"))
    val notFull = stats.join(lastBin, "shard")
      .filter($"bin" < $"last" && $"n_tokens" =!= C)
    assert(notFull.count() == 0)
    // and nothing exceeds capacity, ever
    assert(stats.filter($"n_tokens" > C).count() == 0)
  }

  test("segments reassemble every non-empty document exactly") {
    val byDoc = segs.groupBy($"id").agg(
      sum($"seg_len").as("total"),
      min($"off_in_doc").as("first_off"),
      // contiguity: segments tile [0, n_tok) — max(off+len) == sum(len)
      max($"off_in_doc" + $"seg_len").as("end"))
    val docs = spark.range(200).select(
      $"id", ($"id" * 13 % 21).cast("long").as("n_tok"))
    val bad = byDoc.join(docs, "id").filter(
      $"total" =!= $"n_tok" || $"first_off" =!= 0L || $"end" =!= $"n_tok")
    assert(bad.count() == 0)
    // zero-token docs contribute no segments
    assert(segs.join(docs.filter($"n_tok" === 0), "id").count() == 0)
  }

  test("bin offsets tile each bin without overlap") {
    val bad = segs
      .withColumn("next_off",
        lead($"off_in_bin", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"shard", $"bin").orderBy($"off_in_bin")))
      .filter($"next_off".isNotNull && $"off_in_bin" + $"seg_len" =!= $"next_off")
    assert(bad.count() == 0)
  }
}
