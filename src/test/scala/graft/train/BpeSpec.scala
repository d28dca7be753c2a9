package graft.train

import graft.SparkSpec
import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow greedy frequency order on a constructed corpus") {
    // "aaab" x3, "ab" x2: pair counts r1: (a,a)=6, (a,b)=5 → merge (a,a);
    // r2 vocab: " aa  a  b " x3, " a  b " x2 → (a,b)=5, (aa,a)=3 → (a,b);
    // r3: " aa  ab " x3, " ab " x2 → (aa,ab)=3
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy($"round").select($"a", $"b", $"cnt")
      .as[(String, String, Long)].collect().toSeq
    assert(m == Seq(("a", "a", 6L), ("a", "b", 5L), ("aa", "ab", 3L)))
  }

  test("merge replace is left-to-right non-overlapping (BPE greedy order)") {
    // "aaaa": symbols a a a a; merging (a,a) must give aa aa, not aa a a
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m1 = Bpe.trainMerges(docs, "text", rounds = 2)
      .orderBy($"round").select($"a", $"b", $"cnt")
      .as[(String, String, Long)].collect().toSeq
    // r1: (a,a)=3 → merge; vocab " aa  aa "; r2: (aa,aa)=1
    assert(m1 == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("segmentation with learned merges shrinks symbol counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, "text", rounds = 10)
      .orderBy($"round").select($"a", $"b").as[(String, String)].collect().toSeq
    val words = docs
      .select(explode(graft.text.TextAnalysis.tokens($"text")).as("w"))
      .distinct()
    val before = words.select(sum(length($"w"))).as[Long].head()
    val after = Bpe.segment(words, "w", merges)
      .select(sum($"n_symbols".cast("long"))).as[Long].head()
    assert(after < before, s"10 merges must compress: $after !< $before")
  }

  test("trainWithVocab: repr round-trips the word and agrees with segment") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (mergesDf, vocab) = Bpe.trainWithVocab(docs, "text", rounds = 5)
    // pieces concatenate back to the word — merges never lose characters
    val broken = vocab
      .filter(regexp_replace(trim($"repr"), " ", "") =!= $"w").count()
    assert(broken == 0L, s"$broken words don't round-trip")
    // piece counts equal the driver-side segment() replay of the merges
    val merges = mergesDf.orderBy($"round")
      .select($"a", $"b").as[(String, String)].collect().toSeq
    val viaSegment = Bpe.segment(vocab.select($"w"), "w", merges)
      .select($"w", $"n_symbols".cast("int").as("k"))
    val viaVocab = vocab.select($"w",
      size(split(trim($"repr"), "  ")).as("k2"))
    val diff = viaSegment.join(viaVocab, "w")
      .filter($"k" =!= $"k2").count()
    assert(diff == 0L)
  }

  test("training is partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.trainMerges(docs, "text", 5).orderBy($"round").collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(13), "text", 5)
      .orderBy($"round").collect().toSeq
    assert(a == b)
  }
}
