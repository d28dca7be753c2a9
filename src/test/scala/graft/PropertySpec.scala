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

  test("substitutePrefix matches the Python replace-first model for arbitrary strings") {
    import graft.core.archive.Tar
    val frag: Gen[String] = Gen.listOf(Gen.oneOf("abTDR/._".toSeq)).map(_.mkString)
    samples(Gen.zip(frag, frag, frag), 200).foreach { case (name, drop, add) =>
      // Python: f'{add}{name.replace(drop, "", 1)}' (replace of "" is identity)
      val model =
        if (drop.isEmpty) add + name
        else add + name.replaceFirst(java.util.regex.Pattern.quote(drop), "")
      assert(Tar.substitutePrefix(name, drop, add) == model,
        s"name='$name' drop='$drop' add='$add'")
    }
  }

  test("retry state machine invariants: errors never advance state, fails are terminal-per-message") {
    import graft.ops.editorial.RetryLoop
    val seqGen: Gen[List[Int]] = Gen.listOfN(8, Gen.chooseNum(0, 6))
    samples(seqGen, 40).zipWithIndex.foreach { case (incomings, ref) =>
      val df = incomings.zipWithIndex
        .map { case (inc, i) => (s"R$ref", i + 1, inc) }
        .toDF("reference", "seq", "incoming")
      val got = RetryLoop.retryStateMachine(df, "reference", "seq", "incoming", 3)
        .orderBy($"seq")
        .select($"incoming", $"expected", $"route")
        .as[(Int, Int, String)].collect().toSeq
      // replay the model sequentially
      var last = 0
      got.foreach { case (inc, expected, route) =>
        assert(expected == last + 1, "expected must always be last accepted + 1")
        route match {
          case "fail"  => assert(inc >= 3)                       // limit fires first
          case "error" => assert(inc < 3 && inc != expected)     // rejected, no advance
          case "retry" => assert(inc < 3 && inc == expected); last = inc
          case other   => fail(s"unknown route $other")
        }
      }
    }
  }

  test("topk_by equals sort-take model for random grouped data") {
    import graft.functions.topk_by
    import org.apache.spark.sql.functions._
    val rowGen = Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 400L),
      Gen.chooseNum(-1000, 1000).map(_ / 100.0))
    val rows = samples(rowGen, 300).distinct
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq  // unique (qid, nid)
    val df = rows.toDF("qid", "nid", "sim").repartition(7)
    val got = df.groupBy($"qid").agg(topk_by($"sim", $"nid", 4).as("t"))
      .select($"qid", explode($"t").as("e"))
      .select($"qid", $"e.nid", $"e.sim", $"e.rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val model = rows.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(4).zipWithIndex
        .map { case ((_, n, s), i) => (q, n, s, i + 1) }
    }.sorted
    assert(got == model)
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

  test("PassJoin segment blocking is complete for random strings under ≤2 random edits") {
    // random catalog strings over a SMALL alphabet (worst case for
    // segment diversity), random edit kinds at random positions — the
    // blocked join must recover every planted pair, and must equal the
    // brute-force ED≤2 truth over the whole cross product.
    val alpha = "abc d"
    val strGen = for {
      n <- Gen.choose(1, 30)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq))
    } yield cs.mkString
    def edit(s: String, kind: Int, pos: Int, ch: Char): String = {
      val p = if (s.isEmpty) 0 else pos % (s.length + 1)
      kind % 3 match {
        case 0 if s.nonEmpty => s.take(p % s.length) + s.drop(p % s.length + 1) // delete
        case 1 => s.take(p) + ch + s.drop(p)                                     // insert
        case _ if s.nonEmpty => s.updated(p % s.length, ch)                      // substitute
        case _ => s + ch
      }
    }
    val editGen = Gen.zip(Gen.choose(0, 2), Gen.choose(0, 40), Gen.oneOf(alpha.toSeq))
    val catalog = samples(strGen, 40).distinct.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val dirty = samples(Gen.zip(Gen.choose(0, catalog.size - 1),
        Gen.choose(1, 2), Gen.listOfN(2, editGen)), 60)
      .zipWithIndex.map { case ((ci, nEdits, edits), k) =>
        val base = catalog(ci % catalog.size)._2
        val d = edits.take(nEdits).foldLeft(base) { case (s, (kind, pos, ch)) =>
          edit(s, kind, pos, ch)
        }
        (1000L + k, d)
      }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (i, d) <- dirty; (j, c) <- catalog
      dist = lev(d, c) if dist <= 2
    } yield (i, j, dist)).toSet
    val got = graft.ops.Linkage.fuzzyPairsSegment(
        dirty.toDF("did", "dname"), "did", "dname",
        catalog.toDF("cid", "name"), "cid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
