package graft.ops.editorial

import graft.SparkSpec
import graft.pipeline.TrePipeline
import java.nio.file.Files
import org.apache.spark.sql.functions._

class RetryLoopSpec extends SparkSpec {
  import spark.implicits._

  test("retryStateMachine: accepts last+1, rejects gaps, hard-fails at the limit") {
    // A: clean 1,2,3 → retry, retry, fail(limit)
    // B: first message claims retry 2 (no prior accepted) → error; then 1 → retry
    // C: 1 ok, then gap to 3 → fail fires before the gap check (limit first)
    val msgs = Seq(
      ("A", 1, 1), ("A", 2, 2), ("A", 3, 3),
      ("B", 1, 2), ("B", 2, 1),
      ("C", 1, 1), ("C", 2, 4)
    ).toDF("reference", "seq", "incoming")
    val got = RetryLoop.retryStateMachine(msgs, "reference", "seq", "incoming", 3)
      .orderBy($"reference", $"seq")
      .select($"reference", $"seq", $"expected", $"route")
      .as[(String, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      ("A", 1, 1, "retry"), ("A", 2, 2, "retry"), ("A", 3, 3, "fail"),
      ("B", 1, 1, "error"), ("B", 2, 1, "retry"),
      ("C", 1, 1, "retry"), ("C", 2, 2, "fail")))
  }

  test("handleRetry: reload → bump → save round trip, reference error texts") {
    val conf = spark.sparkContext.hadoopConfiguration
    val state = Files.createTempDirectory("retrystate").toString

    // no state at all → the RetryHandler abort
    assert(RetryLoop.handleRetry(conf, state, "judgment", "TDR-X", 1) ==
      Left("No TDR output data found"))

    val seed = """{"editorial-output":{"consignment-reference":"TDR-X","s3-folder-url":"file://orig.tar.gz","consignment-type":"judgment","number-of-retries":1},"tar-gz":{"bucket":"local","key":"k","items":"[]"}}"""
    RetryLoop.seedState(conf, state, "judgment", "TDR-X", seed)

    // wrong incoming (expected 1) → reference error text, state unchanged
    val bad = RetryLoop.handleRetry(conf, state, "judgment", "TDR-X", 5)
    assert(bad == Left("""Expected number-of-retries to be "1" but got "5""""))

    // correct incoming → reloaded message (orig URL preserved), saved at /0/1/
    val r1 = RetryLoop.handleRetry(conf, state, "judgment", "TDR-X", 1)
    assert(r1.isRight)
    assert(r1.toOption.get.contains(""""s3-folder-url":"file://orig.tar.gz""""))
    val p1 = RetryLoop.messagePath(state, "judgment", "TDR-X", 0, 1)
    assert(p1.getFileSystem(conf).exists(p1))

    // next round: expected advances to 2, bump lands in the saved copy
    val r2 = RetryLoop.handleRetry(conf, state, "judgment", "TDR-X", 2)
    assert(r2.toOption.get.contains(""""number-of-retries":2"""))
    assert(RetryLoop.handleRetry(conf, state, "judgment", "TDR-X", 2) ==
      Left("""Expected number-of-retries to be "3" but got "2""""))
  }

  private def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
    .digest(s.getBytes).map("%02x".format(_)).mkString

  private def writeBag(dir: java.nio.file.Path, name: String,
                       files: Seq[(String, String)]): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    val out = new TarArchiveOutputStream(
      new GzipCompressorOutputStream(Files.newOutputStream(dir.resolve(name))))
    files.foreach { case (n, c) =>
      val b = c.getBytes; val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong); out.putArchiveEntry(e); out.write(b); out.closeArchiveEntry()
    }
    out.close()
  }

  test("runWithRetries drives a corrupt bag 0→1→2→FAILED with persisted state") {
    val dir = Files.createTempDirectory("retrybags")
    val state = Files.createTempDirectory("retrystate2")
    def write(name: String, files: Seq[(String, String)]): Unit =
      writeBag(dir, name, files)
    write("TDR-OK.tar.gz", Seq(
      "./TDR-OK/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-OK/manifest-sha256.txt" -> (sha("FINE") + "  data/doc.docx"),
      "./TDR-OK/data/doc.docx" -> "FINE"))
    write("TDR-CORRUPT.tar.gz", Seq(
      "./TDR-CORRUPT/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-CORRUPT/manifest-sha256.txt" -> (("0" * 64) + "  data/doc.docx"),
      "./TDR-CORRUPT/data/doc.docx" -> "BROKEN"))

    val history = TrePipeline.runWithRetries(
      spark, dir.toString + "/*.tar.gz", state.toString, maxRetries = 3)
    val routes = history.orderBy($"bagId", $"attempt")
      .select($"bagId", $"attempt", $"route")
      .as[(String, Int, String)].collect().toSeq

    // valid bag settles at attempt 0; corrupt bag retries through the
    // protocol and hard-fails when incoming reaches the limit
    assert(routes == Seq(
      ("TDR-CORRUPT", 0, "retry"), ("TDR-CORRUPT", 1, "retry"),
      ("TDR-CORRUPT", 2, "retry"), ("TDR-CORRUPT", 3, "fail"),
      ("TDR-OK", 0, "ok")))

    // saved/reloaded state: folders 0/0, 0/1, 0/2 exist; the final saved
    // message carries the bumped count AND the attempt-0 URL (reloaded,
    // not regenerated)
    val conf = spark.sparkContext.hadoopConfiguration
    (0 to 2).foreach { k =>
      val p = RetryLoop.messagePath(state.toString, "judgment", "TDR-CORRUPT", 0, k)
      assert(p.getFileSystem(conf).exists(p), s"missing state folder $k")
    }
    val last = history.filter($"attempt" === 2 && $"bagId" === "TDR-CORRUPT")
      .select($"message").as[String].head()
    assert(last.contains(""""number-of-retries":2"""))
    assert(last.contains(""""s3-folder-url":"file://TDR-CORRUPT.tar.gz""""))
    // no state folder for the failed attempt (limit check fires before save)
    val p3 = RetryLoop.messagePath(state.toString, "judgment", "TDR-CORRUPT", 0, 3)
    assert(!p3.getFileSystem(conf).exists(p3))
  }

  test("retry re-reads the failing archives: a bag repaired upstream recovers") {
    val dir = Files.createTempDirectory("retryrepair")
    val state = Files.createTempDirectory("retrystate3")
    // manifest claims the GOOD digest but the bag ships broken bytes —
    // the upstream re-export (simulated in onAttempt) fixes the payload
    writeBag(dir, "TDR-FLAKY.tar.gz", Seq(
      "./TDR-FLAKY/bagit.txt" -> "BagIt-Version: 0.97",
      "./TDR-FLAKY/manifest-sha256.txt" -> (sha("GOOD") + "  data/doc.docx"),
      "./TDR-FLAKY/data/doc.docx" -> "BROKEN"))
    val history = TrePipeline.runWithRetries(
      spark, dir.toString + "/*.tar.gz", state.toString, maxRetries = 3,
      onAttempt = a => if (a == 2) writeBag(dir, "TDR-FLAKY.tar.gz", Seq(
        "./TDR-FLAKY/bagit.txt" -> "BagIt-Version: 0.97",
        "./TDR-FLAKY/manifest-sha256.txt" -> (sha("GOOD") + "  data/doc.docx"),
        "./TDR-FLAKY/data/doc.docx" -> "GOOD")))
    val routes = history.orderBy($"attempt")
      .select($"attempt", $"route").as[(Int, String)].collect().toSeq
    // fails at 0, retries at 1 (still broken), recovers at 2 after repair
    assert(routes == Seq((0, "retry"), (1, "retry"), (2, "ok")))
  }
}
