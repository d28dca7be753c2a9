package graft.pipeline

import graft.core.archive.{Tar, TarEntry}
import graft.core.io.TextTables
import graft.core.model.TreEvents
import graft.ops.validate.BagitValidate
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The integrated batch pipeline (SURVEY §3.1 / §7.1 module 7): what the
  * reference runs as a Step Function of Lambdas becomes ONE Spark job over
  * a batch of consignments — process boundaries collapse into stage
  * DataFrames, S3 intermediate state into in-plan columns.
  *
  *   explode(tar) → parse side-files → checksum verify (J3) →
  *   count reconciliation (A1) + set differences (U1/U2) →
  *   per-bag verdict with error channel → provenance-chained result event
  *
  * Every stage result is exposed so tests/operators can inspect the
  * "execution history" (the reference's per-step inputs/outputs,
  * tre_module_test consignment_tester.py:147-259).
  */
final case class PipelineResult(
    entries: Dataset[TarEntry],
    checksums: DataFrame,
    reconciliation: DataFrame,
    verdicts: DataFrame,
    events: DataFrame)

/** Full main-path result (§3.1 steps 3–7). `outputMessages` carries the
  * editorial output message per bag with the archive + sha256-sidecar URLs
  * threaded through the K8 presign seam.
  */
final case class FullPipelineResult(
    validation: PipelineResult,
    parserInputs: DataFrame,
    parserOutputs: DataFrame,
    editorial: DataFrame,
    bundles: DataFrame,
    outputMessages: DataFrame)

object TrePipeline {

  /** Exploded entries → (bagId, name, content) rows with the leading
    * `<reference>/` bag-root component stripped.
    */
  private def filesOf(spark: SparkSession, entries: Dataset[TarEntry]): DataFrame = {
    import spark.implicits._
    entries.filter(!_.isDir)
      .map(e => (e.source, e.name.substring(e.name.indexOf('/') + 1), e.bytes))
      .toDF("bagId", "name", "content")
  }

  /** Run validation over a directory of `<reference>.tar.gz` bags. */
  def run(spark: SparkSession, bagsGlob: String,
          environment: String = "dev"): PipelineResult = {
    import spark.implicits._

    // S7: one streaming explode per archive, bagId = archive basename
    val entries = Tar.explodePath(spark, bagsGlob)
      .map(e => e.copy(source = e.source.stripSuffix(".tar.gz")))
      .cache()

    val files = filesOf(spark, entries)

    val (checksums, reconciliation, verdicts) = verdictsForFiles(files)

    // result event with provenance chain: prior TDR event → TRE event
    // (dual ok/error outputs, tre_vb_validate_bagit.py:124-161)
    val prior = struct(
      lit(TreEvents.Version).as("version"),
      lit(0L).as("timestamp"),
      array(map_from_arrays(array(lit("TDR-UUID")),
        array(md5(col("bagId"))))).as("UUIDs"),
      struct(lit("TDR").as("name"), lit("export").as("process"),
        lit("judgment").as("type"), lit(environment).as("environment"),
        lit("bagit-available").as("event-name")).as("producer"),
      map_from_arrays(array(lit("bagit-available")), array(lit("{}")))
        .as("parameters"))
    val eventName = when(col("ok"), lit("bagit-validated"))
      .otherwise(lit("bagit-validation-error"))
    val events = verdicts.withColumn("event",
      TreEvents.createFromCol(prior, "TRE", "tre-validate-bagit", environment,
        eventName,
        map_from_arrays(
          array(eventName),
          array(to_json(struct(col("bagId").as("reference"),
            col("errors").as("errors")))))))
      .withColumn("event_name", eventName)

    PipelineResult(entries, checksums, reconciliation, verdicts, events)
  }

  /** Checksum verification (J3) + count reconciliation (A1) + per-bag
    * verdict for a batch of exploded bag files. Factored out so the retry
    * loop can re-validate a failing subset without re-exploding archives.
    */
  private def verdictsForFiles(files: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // S1 from exploded bytes: data-file manifest per bag
    val manifestLines = files
      .filter(col("name") === "manifest-sha256.txt")
      .select(col("bagId"),
        explode(split(decode(col("content"), "UTF-8"), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
    // fixed-width parse (S1) with the bag key carried through
    val manifestKeyed = manifestLines.select(col("bagId"),
      lower(substring(col("line"), 1, 64)).as("checksum"),
      trim(expr("substring(line, 65)")).as("file"))

    // J3: verify payload checksums against the manifest
    val dataFiles = files.filter(col("name").startsWith("data/"))
    val checksums = BagitValidate.verifyChecksums(
      dataFiles, manifestKeyed.select(col("bagId"), col("file"), col("checksum")))

    // A1: count reconciliation — root manifest rows = files outside data/
    // minus the manifest itself ("Catch-22", tre_vb_validate_bagit_files.py:88-121)
    val rootManifest = files
      .filter(!col("name").startsWith("data/") &&
        col("name") =!= "manifest-sha256.txt")
      .select(col("bagId"), col("name").as("file"))
    val reconciliation = BagitValidate.reconcileCounts(
      rootManifest, manifestKeyed.select(col("bagId"), col("file")),
      files.select(col("bagId"), col("name")))

    // per-bag verdict: checksum failures ∪ reconciliation failures
    val checksumErrors = checksums.filter(col("status") =!= "ok")
      .groupBy("bagId")
      .agg(collect_list(concat(col("status"), lit(": "), col("file"))).as("cs_errors"))
    val verdicts = reconciliation
      .join(checksumErrors, Seq("bagId"), "left")
      .withColumn("errors", concat(
        coalesce(col("cs_errors"), array().cast("array<string>")),
        when(!col("counts_ok"), array(lit("file count mismatch")))
          .otherwise(array().cast("array<string>")),
        when(!col("data_counts_ok"), array(lit("data file count mismatch")))
          .otherwise(array().cast("array<string>"))))
      .withColumn("ok", size(col("errors")) === 0)
      .select(col("bagId"), col("ok"), col("errors"),
        col("n_root"), col("n_data"), col("n_extracted"))

    (checksums, reconciliation, verdicts)
  }

  /** The complete §3.1 main path in one job: validate → prepare parser
    * input (step 5: first data file, prepare_parser_input.py:124-131) →
    * parser contract (step 6, stub seam) → TRE metadata + editorial bundle
    * tar.gz per consignment (step 7) under `<outDir>/<ref>/0/`.
    */
  def runFull(spark: SparkSession, bagsGlob: String, outDir: String,
              environment: String = "dev", version: String = "0.1.0"): FullPipelineResult = {
    import spark.implicits._
    import graft.ops.editorial.{Editorial, ParserStub}

    val v = run(spark, bagsGlob, environment)
    val okBags = v.verdicts.filter(col("ok")).select(col("bagId"))

    // step 5: judgment doc = FIRST data file (compat with the reference's
    // data[0] assumption; generalized inventory kept in `entries`)
    val dataDocs = v.entries.filter(!_.isDir)
      .map(e => (e.source, e.name.substring(e.name.indexOf('/') + 1)))
      .toDF("bagId", "name")
      .filter(col("name").startsWith("data/"))
      .groupBy(col("bagId")).agg(min(col("name")).as("judgment_doc"))
    val parserInputs = okBags.join(dataDocs, Seq("bagId"))
      .withColumn("msg", Editorial.parserInputMessage(
        col("bagId"), lit("local"), concat(lit("file://"), col("judgment_doc")),
        concat(lit("parsed/judgment/"), col("bagId"), lit("/0/")),
        element_at(split(col("judgment_doc"), "/"), -1),
        lit("judgment"), lit(0)))

    // step 6: parser contract (stub seam — swap for the real parser)
    val parserOutputs = parserInputs.select(
      col("bagId"), col("judgment_doc"),
      ParserStub.outputStruct(col("bagId"),
        element_at(split(col("judgment_doc"), "/"), -1)).as("po"))

    // step 7: TRE metadata JSON + bundle (metadata + judgment doc bytes).
    // metadata.json is emitted once per bag, and only the step-5 judgment
    // doc is bundled — a bag with k>1 data files must not get k duplicate
    // metadata entries or bundle every data file.
    val docBytes = v.entries.filter(!_.isDir)
      .map(e => (e.source, e.name.substring(e.name.indexOf('/') + 1), e.bytes))
      .toDF("bagId", "name", "bytes")
    val editorial = parserOutputs
      .withColumn("tre_metadata", to_json(struct(
        struct(lit("TRE").as("name"), lit("transform").as("process"),
          lit("judgment").as("type"), lit(environment).as("environment")).as("producer"),
        struct(
          concat(lit("TRE-"), col("bagId")).as("reference"),
          lit(version).as(s"$environment-tre-version"),
          col("po.xml").as("xml"), col("po.log").as("log"),
          col("po.error_messages").as("error-messages")).as("parameters"))))
    val metaEntries = editorial
      .select(col("bagId"), col("tre_metadata"))
      .as[(String, String)]
      .map { case (bag, meta) =>
        TarEntry(bag, s"$bag/0/metadata.json", meta.getBytes("UTF-8"), 0L, isDir = false)
      }
    val docEntries = editorial
      .select(col("bagId"), col("judgment_doc"))
      .join(docBytes, Seq("bagId"))
      .filter(col("name") === col("judgment_doc"))
      .select(col("bagId"), col("name"), col("bytes"))
      .as[(String, String, Array[Byte])]
      .map { case (bag, name, bytes) =>
        TarEntry(bag, s"$bag/0/" + name.substring(name.indexOf('/') + 1), bytes, 0L, isDir = false)
      }
    val bundleEntries = metaEntries.unionByName(docEntries)
    val bundles = graft.core.archive.Tar
      .packageBags(bundleEntries, outDir).toDF()

    // K8 demonstrated end-to-end: the per-bag output message carries the
    // packed archive's URL and its .sha256 sidecar URL through the presign
    // seam (outputMessage shape, tre_editorial_integration.py:311-324)
    val outputMessages = bundles.select(
      col("bagId"),
      Editorial.presignUrl(col("path")).as("s3_folder_url"),
      Editorial.presignUrl(concat(col("path"), lit(".sha256"))).as("s3_sha256_url"),
      col("sha256"),
      to_json(struct(
        struct(
          col("bagId").as("consignment-reference"),
          Editorial.presignUrl(col("path")).as("s3-folder-url"),
          Editorial.presignUrl(concat(col("path"), lit(".sha256"))).as("s3-sha256-url"),
          lit("judgment").as("consignment-type"),
          lit(0).as("number-of-retries")).as("editorial-output"),
        struct(
          lit("local").as("bucket"),
          concat(col("bagId"), lit(".tar.gz")).as("key"),
          to_json(col("items")).as("items")).as("tar-gz"))).as("output_message"))

    FullPipelineResult(v, parserInputs, parserOutputs.withColumnRenamed("po", "parser_outputs"),
      editorial, bundles, outputMessages)
  }

  /** Initial editorial output message (outputMessage shape,
    * tre_editorial_integration.py:311-324) for the attempt-0 state seed.
    */
  private def initialMessage(bag: String, consignmentType: String, retries: Int): String =
    s"""{"editorial-output":{"consignment-reference":"$bag",""" +
      s""""s3-folder-url":"file://$bag.tar.gz","s3-sha256-url":"file://$bag.tar.gz.sha256",""" +
      s""""consignment-type":"$consignmentType","number-of-retries":$retries},""" +
      s""""tar-gz":{"bucket":"local","key":"$bag.tar.gz","items":"[]"}}"""

  /** §3.1 with the retry protocol wired end-to-end (RetryHandler
    * tre_editorial_integration.py:432-542 + the Step Function's retry-limit
    * hard fail, driven the way test_editorial_retry.py:33-60 and
    * test_tdr_bagit_retry.py:62-77 drive the reference):
    *
    *  - attempt 0 validates every bag in one job and seeds the
    *    per-consignment `output-message.json` under
    *    `<state>/<type>/<ref>/0/0/` — retries=0 when valid, bumped to 1 on
    *    failure (tre_bagit_checksum_validation.py:159-163);
    *  - each later attempt k re-validates ONLY the still-failing bags
    *    (one distributed job per round, not per bag) and performs the
    *    RetryHandler storage round trip per bag on executors: find latest
    *    retry folder → require incoming == last+1 → reload saved message →
    *    bump → save under folder k;
    *  - incoming ≥ maxRetries hard-fails the consignment (route `fail`).
    *
    * Rounds are a driver loop bounded by maxRetries; every round's work is
    * distributed (the driver only unions DataFrames and checks emptiness).
    * Returns the attempt history:
    * (bagId, attempt, incoming, route, msg_path, message).
    */
  def runWithRetries(spark: SparkSession, bagsGlob: String, stateDir: String,
                     environment: String = "dev", maxRetries: Int = 3,
                     consignmentType: String = "judgment",
                     onAttempt: Int => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    import graft.ops.editorial.RetryLoop

    val v = run(spark, bagsGlob, environment)
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val state = stateDir
    val ctype = consignmentType

    // attempt 0: validate everything, seed state (one task per bag)
    val attempt0 = v.verdicts.select(col("bagId"), col("ok"))
      .as[(String, Boolean)]
      .map { case (bag, ok) =>
        val retries = if (ok) 0 else 1   // bumped on error, ready for resubmit
        val msg = initialMessage(bag, ctype, retries)
        val path = RetryLoop.seedState(hadoopConf.value, state, ctype, bag, msg)
        (bag, 0, 0, if (ok) "ok" else "retry", path, msg)
      }
      .toDF("bagId", "attempt", "incoming", "route", "msg_path", "message")
      .cache()

    var history = attempt0
    var failing = attempt0.filter(col("route") === "retry").select("bagId")
    var attempt = 1
    while (attempt <= maxRetries && !failing.isEmpty) {
      onAttempt(attempt)   // seam: the reference re-fetches fresh content
      // re-validation re-reads ONLY the failing archives from storage —
      // a bag repaired upstream between retries (the reference's
      // re-download path) is observed, unlike re-checking cached bytes.
      // The failing-id collect is one string per failing bag, bounded by
      // the consignment count, not data volume.
      val failingSet = failing.as[String].collect().toSet
      val fresh = Tar.explodePath(spark, bagsGlob,
          p => failingSet.contains(
            p.split('/').last.stripSuffix(".tar.gz")))
        .map(e => e.copy(source = e.source.stripSuffix(".tar.gz")))
      val files = filesOf(spark, fresh)
      val (_, _, verdicts) = verdictsForFiles(files)
      val a = attempt
      val rec = verdicts.select(col("bagId"), col("ok"))
        .as[(String, Boolean)]
        .map { case (bag, ok) =>
          if (ok) (bag, a, a, "ok", "", "")
          else if (a >= maxRetries) (bag, a, a, "fail", "", "")
          else RetryLoop.handleRetry(hadoopConf.value, state, ctype, bag, a) match {
            case Right(msg) =>
              (bag, a, a, "retry",
                RetryLoop.messagePath(state, ctype, bag, 0, a).toString, msg)
            case Left(err) => (bag, a, a, s"error: $err", "", "")
          }
        }
        .toDF("bagId", "attempt", "incoming", "route", "msg_path", "message")
        .cache()
      history = history.unionByName(rec)
      failing = rec.filter(col("route") === "retry").select("bagId")
      attempt += 1
    }
    history
  }
}
