package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def writeJsonl(dir: java.nio.file.Path, name: String,
                         vals: Seq[Long]): Unit =
    Files.write(dir.resolve(name),
      vals.map(v => s"""{"v":$v}""").mkString("\n").getBytes("UTF-8"))

  test("per-batch PSI lands in the store; a shifted batch scores higher than a matching one") {
    val ref = (0 until 400).map(i => i % 40L).toDF("v")

    def runOnce(tag: String, vals: Seq[Long]): (Long, Double) = {
      val root = Files.createTempDirectory(s"driftmon$tag")
      val in = root.resolve("in"); Files.createDirectories(in)
      writeJsonl(in, "batch.jsonl", vals)
      val stream = spark.readStream.schema("v LONG").json(in.toString)
      val q = DriftMonitor.monitor(stream, "v", ref, "v",
        width = 4, nBuckets = 10,
        outDir = root.resolve("out").toString,
        checkpoint = root.resolve("ckpt").toString)
      q.processAllAvailable(); q.stop()
      val row = spark.read.parquet(root.resolve("out").toString)
        .select($"n_batch", $"psi").as[(Long, Double)].head()
      row
    }

    // same distribution as the reference → small PSI
    val (nSame, psiSame) = runOnce("same", (0 until 400).map(i => i % 40L))
    assert(nSame == 400L && psiSame >= 0.0)
    // mass shifted into the top bucket → much larger PSI
    val (nShift, psiShift) = runOnce("shift", Seq.fill(400)(39L))
    assert(nShift == 400L)
    assert(psiShift > psiSame + 0.5,
      s"shifted PSI $psiShift should dominate matched PSI $psiSame")
  }
}
