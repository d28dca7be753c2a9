package graft.streaming

import graft.SparkSpec
import graft.sources.Warc
import java.nio.file.Files
import org.apache.spark.sql.functions._

class WarcIngestSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textB = "one two three four five six seven eight nine"
  private val textC = "completely different novel content words here"

  test("crawl landing → ranged fetch → gate → dedup-at-ingest → corpus") {
    val warcDir = Files.createTempDirectory("crawl")
    val store = Files.createTempDirectory("warc_sigs").toString
    val corpus = Files.createTempDirectory("warc_corpus").toString

    val q = WarcIngest.writer(
      WarcIngest.cdxStream(spark, warcDir.toString), warcDir.toString,
      store, corpus).start()

    // batch 1: one archive; uri /1 and /2 carry IDENTICAL text (in-batch
    // dup), /3 is distinct
    Warc.write(Seq(
      ("seg-00", 1L, textA), ("seg-00", 2L, textA), ("seg-00", 3L, textB)
    ).toDF("source", "doc_id", "text"), warcDir.toString).collect()
    q.processAllAvailable()

    val b0 = spark.read.parquet(s"$corpus/b0")
      .select($"uri", $"text").as[(String, String)].collect()
    // exactly one of the two textA copies admitted, plus textB
    assert(b0.count(_._2 == textA) == 1)
    assert(b0.count(_._2 == textB) == 1)
    assert(b0.length == 2)

    // batch 2: a NEW archive lands — /10 duplicates the standing textA,
    // /11 is novel, /12 fails the min-length gate
    Warc.write(Seq(
      ("seg-01", 10L, textA), ("seg-01", 11L, textC), ("seg-01", 12L, "tiny")
    ).toDF("source", "doc_id", "text"), warcDir.toString).collect()
    q.processAllAvailable()
    q.stop()

    val b1 = spark.read.parquet(s"$corpus/b1")
      .select($"uri", $"text").as[(String, String)].collect()
    // only the novel doc joins the corpus: the standing dup is refused,
    // the short doc never reaches dedup
    assert(b1.map(_._2).toSeq == Seq(textC))
    assert(b1.head._1 == "https://corpus.invalid/seg-01/11")

    // the signature store holds exactly the three distinct admitted docs
    val stored = CorpusIngest.readStore(spark, store).count()
    assert(stored == 3L)
  }
}
