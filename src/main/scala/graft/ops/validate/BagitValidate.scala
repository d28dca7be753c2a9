package graft.ops.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bag validation operators (SURVEY §2 J3/A1/A2/A4/U1/U2), bag-aware: every
  * input carries a `bagId` column so thousands of consignments validate in
  * one distributed pass (the reference validates one bag per Lambda invoke).
  *
  * Error semantics: no per-row exceptions — each check emits rows/flags
  * that fold into an `errors` array per bag (mirrors the dual ok/error
  * event outputs, tre_vb_validate_bagit.py:124-161).
  */
object BagitValidate {

  /** J3/A5: expected (manifest) vs computed (sha256 of content) per file.
    * Full outer join also surfaces manifest entries with no file
    * (`missing_file`) and files with no manifest entry (`not_in_manifest`).
    * Reference per-item verify: s3_lib/s3_lib/checksum_lib.py:81-99,121-154.
    */
  def verifyChecksums(files: DataFrame, manifest: DataFrame): DataFrame = {
    // disjoint column names before the join: both inputs may derive from
    // the same source frame (e.g. one exploded-entries Dataset), which
    // otherwise trips DetectAmbiguousSelfJoin
    val f = files.select(col("bagId").as("f_bagId"), col("name").as("f_name"),
      lower(sha2(col("content"), 256)).as("computed"))
    val m = manifest.select(col("bagId").as("m_bagId"), col("file").as("m_file"),
      lower(col("checksum")).as("expected"))
    m.join(f, col("m_bagId") === col("f_bagId") && col("m_file") === col("f_name"),
      "full_outer")
      .select(
        coalesce(col("m_bagId"), col("f_bagId")).as("bagId"),
        coalesce(col("m_file"), col("f_name")).as("file"),
        col("expected"), col("computed"),
        when(col("expected").isNull, lit("not_in_manifest"))
          .when(col("computed").isNull, lit("missing_file"))
          .when(col("expected") === col("computed"), lit("ok"))
          .otherwise(lit("checksum_mismatch")).as("status"))
  }

  /** A1: file-count reconciliation per bag
    * (tre_vb_validate_bagit_files.py:88-121):
    * `1 + |root| + |data|` must equal `|extracted|` (the root manifest
    * lists everything except itself — the reference's "Catch-22" comment),
    * and `|data|` must equal the extracted files under `data/`.
    */
  def reconcileCounts(rootManifest: DataFrame, dataManifest: DataFrame,
                      extracted: DataFrame, dataDir: String = "data/"): DataFrame = {
    val root = rootManifest.groupBy("bagId").agg(count(lit(1)).as("n_root"))
    val data = dataManifest.groupBy("bagId").agg(count(lit(1)).as("n_data"))
    val ext = extracted.groupBy("bagId").agg(
      count(lit(1)).as("n_extracted"),
      count(when(col("name").startsWith(dataDir), 1)).as("n_extracted_data"))
    ext.join(root, Seq("bagId"), "left").na.fill(0L, Seq("n_root"))
      .join(data, Seq("bagId"), "left").na.fill(0L, Seq("n_data"))
      .withColumn("counts_ok",
        lit(1) + col("n_root") + col("n_data") === col("n_extracted"))
      .withColumn("data_counts_ok", col("n_data") === col("n_extracted_data"))
  }

  /** U1/U2: set-difference checks, strictly stronger than the reference's
    * count equality (SURVEY §4 "latent bugs"): per bag, names listed but
    * not extracted and vice versa.
    */
  def setDifferences(listing: DataFrame, extracted: DataFrame): DataFrame = {
    val l = listing.select(col("bagId"), col("name"))
    val e = extracted.select(col("bagId"), col("name"))
    l.join(e, Seq("bagId", "name"), "left_anti").withColumn("side", lit("only_listed"))
      .unionByName(
        e.join(l, Seq("bagId", "name"), "left_anti").withColumn("side", lit("only_extracted")))
  }

  /** A4: a checksum side-file must contain exactly one entry whose basename
    * matches the expected archive name
    * (tre_vb_validate_bagit.py:100-116; tre_bagit_checksum_validation.py:136-152).
    */
  def singleEntryCheck(manifest: DataFrame, expectedBasename: String): DataFrame =
    manifest.groupBy("bagId").agg(
      count(lit(1)).as("n_entries"),
      first(col("basename")).as("basename"))
      .select(col("bagId"),
        array_compact(array(
          when(col("n_entries") =!= 1,
            concat(lit("expected 1 manifest entry, got "), col("n_entries"))),
          when(col("n_entries") === 1 && col("basename") =!= expectedBasename,
            concat(lit(s"manifest basename mismatch: expected $expectedBasename, got "),
              col("basename"))))).as("errors"))

  /** Fold per-file statuses into a per-bag error array + ok flag. */
  def summarize(checks: DataFrame): DataFrame =
    checks.filter(col("status") =!= "ok")
      .groupBy("bagId")
      .agg(collect_list(concat(col("status"), lit(": "), col("file"))).as("errors"))
      .withColumn("ok", lit(false))
}
