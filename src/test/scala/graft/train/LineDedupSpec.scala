package graft.train

import graft.SparkSpec
import graft.dedup.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // 8-token lines by construction: "lines" align with lineTokens=8
  private val lineA = "a b c d e f g h"
  private val lineB = "p q r s t u v w"
  private val lineC = "one two three four five six seven eight"

  test("keep-first drops repeated lines from later docs only") {
    val docs = Seq(
      (1L, s"$lineA $lineB"),       // both lines first seen here
      (2L, s"$lineA $lineC"),       // lineA is a repeat, lineC fresh
      (3L, s"$lineB $lineA")        // nothing fresh
    ).toDF("doc_id", "text")
    val out = LineDedup.lineDedupProfile(docs)
      .orderBy($"id")
      .select($"id", $"n_lines", $"n_kept").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("within-doc duplicate lines keep exactly the first occurrence") {
    val docs = Seq((7L, s"$lineA $lineA $lineB")).toDF("doc_id", "text")
    val out = LineDedup.lineDedupProfile(docs)
      .select($"n_lines", $"n_kept", $"kept_frac").as[(Long, Long, Double)].head()
    assert(out == ((3L, 2L, 0.6667)))
  }

  test("retained fingerprint = md5 of surviving text in original order") {
    val docs = Seq((1L, s"$lineA $lineB"), (2L, s"$lineB $lineC")).toDF("doc_id", "text")
    val fp = LineDedup.lineDedupProfile(docs)
      .filter($"id" === 2L).select($"retained_fp").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(lineC.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp == expected)
  }

  test("profile is partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LineDedup.lineDedupProfile(docs).orderBy($"id").collect().toSeq
    val b = LineDedup.lineDedupProfile(docs.repartition(13)).orderBy($"id").collect().toSeq
    assert(a == b)
  }
}
