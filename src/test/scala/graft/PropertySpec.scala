package graft

import graft.core.io.TextTables
import graft.functions.PercentEncode
import graft.ops.drisip.CsvRender
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5: the reference has none — these
  * guard the parsing/encoding seams). Plain scalacheck generators driven
  * deterministically (fixed seed) so failures reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  val hexGen: Gen[String] = Gen.listOfN(64, Gen.oneOf("0123456789abcdef".toSeq))
    .map(_.mkString)
  val pathGen: Gen[String] = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.identifier, Gen.const("data")))
    .map(_.take(4).mkString("/"))
  val anyStr: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("aé, \"x\t:%/+ÿ中".toSeq)).map(_.mkString))

  test("manifest parse round-trip: digest + path survive for any path") {
    val cases = samples(Gen.zip(hexGen, pathGen), 60)
      .filter { case (_, p) => p.trim == p && p.nonEmpty }
    val df = cases.map { case (d, p) => s"$d  $p" }.toDF("line")
    val got = TextTables.parseManifest(df).collect()
    cases.zip(got).foreach { case ((d, p), row) =>
      assert(row.getString(0) == d)
      assert(row.getString(1) == p, s"path '$p'")
    }
  }

  test("percent-encode decodes back to the original for arbitrary strings") {
    samples(anyStr, 200).foreach { s =>
      val enc = PercentEncode.encode(s)
      val dec = java.net.URLDecoder.decode(enc.replace("+", "%2B"), "UTF-8")
      assert(dec == s, s"round-trip failed for ${s.map(_.toInt)}")
      assert(enc.replaceAll("%[0-9A-F]{2}", "").forall(c =>
        (c.isLetterOrDigit && c < 128) || "_.-~:/".contains(c)),
        s"unsafe char left in '$enc'")
    }
  }

  test("csv field quoting parses back to the original (QUOTE_MINIMAL)") {
    val cases = samples(Gen.zip(anyStr, anyStr), 60)
      .filter { case (a, b) =>
        !(a + b).exists(c => c == '\r' || c == '\n') && a.nonEmpty && b.nonEmpty }
    cases.foreach { case (a, b) =>
      val line = Seq((a, b)).toDF("a", "b")
        .select(CsvRender.lines(Seq((a, b)).toDF("a", "b"), Seq("a", "b")))
        .as[String].head()
      // escape='"' → RFC-4180 quote doubling (Spark's default escape is '\')
      val parsed = spark.read.option("header", "false")
        .option("escape", "\"")
        .csv(Seq(line).toDS()).head()
      assert(Option(parsed.getString(0)).getOrElse("") == a, s"a='$a' line='$line'")
      assert(Option(parsed.getString(1)).getOrElse("") == b, s"b='$b' line='$line'")
    }
  }

  test("count-equality is weaker than set-difference (A2 vs U2)") {
    // a swap (one extra + one missing) passes counts but fails set-diff
    val listing = Seq(("b", "x"), ("b", "y")).toDF("bagId", "name")
    val extracted = Seq(("b", "x"), ("b", "z")).toDF("bagId", "name")
    assert(listing.count() == extracted.count())  // count check passes
    val diffs = graft.ops.validate.BagitValidate
      .setDifferences(listing, extracted).count()
    assert(diffs == 2)                            // set difference catches it
  }
}
