package graft.sources

import graft.SparkSpec
import graft.core.io.TextTables
import java.nio.file.Files

class ManifestSourceSpec extends SparkSpec {
  import spark.implicits._

  private def digest(seed: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val dir = {
    val d = Files.createTempDirectory("manifests")
    Files.write(d.resolve("manifest-0.txt"),
      (s"${digest("a").toUpperCase}  data/dir/a.docx\n" +
        s"${digest("b")}  data/b.docx\n").getBytes("UTF-8"))
    Files.write(d.resolve("manifest-1.txt"),
      s"${digest("c")}  c.json\n".getBytes("UTF-8"))
    d.toString
  }

  test("V2 source matches TextTables.parseManifest, one partition per file") {
    val v2 = spark.read.format("graft.sources.ManifestDataSource").load(dir)
      .orderBy($"file")
    val viaText = TextTables
      .parseManifest(spark.read.text(s"$dir/*.txt").withColumnRenamed("value", "line"))
      .orderBy($"file")
    assert(v2.collect().toSeq == viaText.collect().toSeq)
    // digest case folded, basename split
    val row = v2.filter($"file" === "data/dir/a.docx").head()
    assert(row.getString(0) == digest("a") && row.getString(2) == "a.docx")
    // file-grain parallelism: one input partition per manifest (on the
    // raw scan — the orderBy above shuffles and AQE coalesces)
    assert(spark.read.format("graft.sources.ManifestDataSource").load(dir)
      .rdd.getNumPartitions == 2)
  }

  test("write side round-trips through the read side in manifest format") {
    val out = Files.createTempDirectory("manifestw").toString
    val df = Seq(
      (digest("x").toUpperCase, "data/x.docx"),
      (digest("y"), "deep/path/y.json")
    ).toDF("checksum", "file")
    df.coalesce(1).write.format("graft.sources.ManifestDataSource")
      .mode("append").save(out)
    // on-disk bytes are the reference's fixed-width format
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".manifest"))
    assert(files.length == 1)
    val text = new String(Files.readAllBytes(files.head.toPath), "UTF-8")
    assert(text.contains(digest("x") + "  data/x.docx\n"))
    // and the read side parses them back (digest case-folded on write)
    val back = spark.read.format("graft.sources.ManifestDataSource").load(out)
      .orderBy($"file").select($"checksum", $"file", $"basename")
      .as[(String, String, String)].collect().toSeq
    assert(back == Seq(
      (digest("x"), "data/x.docx", "x.docx"),
      (digest("y"), "deep/path/y.json", "y.json")))
  }

  test("column pruning reaches the scan (ReadSchema carries only the projection)") {
    val pruned = spark.read.format("graft.sources.ManifestDataSource").load(dir)
      .select($"basename")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("basename"), plan)
    assert(!plan.contains("checksum"), plan)
    assert(pruned.as[String].collect().sorted.toSeq ==
      Seq("a.docx", "b.docx", "c.json"))
  }
}
