package graft.queries

import graft.{QueryDef, Tables}
import graft.core.archive.{Tar, TarEntry}
import org.apache.spark.sql.functions._

/** S7/K2 verified through the DuckDB oracle: pack each `source` group of
  * documents into an in-memory tar.gz (K2 packaging path), explode it back
  * (S7), and emit (name, sha256) — which must equal hashing the original
  * rows directly. The archive layer itself isn't SQL-expressible, but its
  * round-trip invariant is.
  */
object ArchiveQueries {

  /** Per-process scratch root for the WARC render/read-back gates: the
    * previous shared "/tmp/graft_warc/<tag>_<sfDir>" path raced when two
    * drivers (e.g. a Verify and a Bench) ran the same sfDir concurrently
    * — one JVM's delete-then-write clobbered the other's read. pid-keyed,
    * so a JVM's own re-runs still overwrite their own dirs.
    */
  private val warcTmp: String =
    s"/tmp/graft_warc/p${java.lang.ProcessHandle.current().pid()}"

  /** Build-once shared WARC fixture for the READ-path connector gates
    * (r13 opt): the six index/pushdown gates each re-rendered their own
    * private copy of the SAME docs→WARC fixture on EVERY invocation —
    * the render (sha256 + gzip member per doc + sidecar) was ~2/3 of
    * each gate's time while the gate's subject is the connector's read
    * path. This is the repo's standard lifecycle-gate convention
    * (pid-keyed scratch + build-once per JVM, like `ann_ivf_persist`
    * and the streaming stores): Verify/Bench build once, best-of-N then
    * measures the amortized read path. The CDX frame the build returns
    * is persisted alongside (`_cdx.parquet` — a directory, invisible to
    * the connector's file listing) for the selective-fetch gate.
    * `s_warc_roundtrip` deliberately KEEPS its per-invocation write —
    * the write+read round trip is that gate's subject.
    */
  private def sharedWarcFixture(spark: org.apache.spark.sql.SparkSession,
                                dir: String): String = {
    val root = warcTmp + "/shared_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    Fixtures.onceClean(root, "_fixture_done") {
      val docs = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("text"))
      // repartition (NOT coalesce — coalesce(1) would propagate up and
      // serialize the per-source render tasks onto one core)
      graft.sources.Warc.write(docs, root)
        .toDF().repartition(1).write.mode("overwrite")
        .parquet(root + "/_cdx.parquet")
      Fixtures.done(root)
    }
    root
  }

  /** Build-once two-crawl fixture for the revisit gate (same rationale
    * as [[sharedWarcFixture]]): crawl A under `<root>/a`, crawl B under
    * `<root>/b`.
    */
  private def revisitWarcFixture(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): String = {
    val root = warcTmp + "/rev_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    Fixtures.onceClean(root, "_fixture_done") {
      val docs = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("text"))
      graft.sources.Warc
        .write(docs.filter(col("doc_id") % 5 =!= 4), root + "/a")
        .localCheckpoint(eager = true)
      val docsB = docs.withColumn("text",
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")))
      graft.sources.Warc.write(docsB, root + "/b")
        .localCheckpoint(eager = true)
      Fixtures.done(root)
    }
    root
  }

  val defs: Map[String, QueryDef] = Map(
    "s7_tar_roundtrip" -> QueryDef(
      (spark, dir) => {
        import spark.implicits._
        val docs = Tables.documents(spark, dir)
          .select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
        val archives = docs.groupByKey(_._1).mapGroups { (source, it) =>
          val buf = new java.io.ByteArrayOutputStream()
          val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
            new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(buf))
          out.setLongFileMode(org.apache.commons.compress.archivers.tar
            .TarArchiveOutputStream.LONGFILE_POSIX)
          // deterministic entry order inside the archive
          it.toSeq.sortBy(_._2).foreach { case (_, id, text) =>
            val bytes = text.getBytes("UTF-8")
            val e = new org.apache.commons.compress.archivers.tar
              .TarArchiveEntry(s"./data/doc_$id.txt")
            e.setSize(bytes.length.toLong)
            e.setModTime(0L)
            out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
          }
          out.close()
          (s"$source.tar.gz", buf.toByteArray)
        }
        archives.flatMap { case (name, bytes) => Tar.entries(name, bytes) }
          .filter((e: TarEntry) => !e.isDir)
          .map((e: TarEntry) => (e.name, new String(e.bytes, "UTF-8")))
          .toDF("name", "content")
          .select(col("name"), sha2(col("content"), 256).as("sha256"))
          .orderBy(col("name"))
      },
      """SELECT 'data/doc_' || doc_id || '.txt' AS name, sha256(text) AS sha256
        |FROM documents ORDER BY name""".stripMargin),

    // ── WARC round-trip (the Common Crawl wire format): render every doc
    //    as a gzip-member WARC record, stream the files out, full-scan
    //    them back (1 task/file, memory = 1 record) and prove the payload
    //    survives byte-exactly. The framing/compression isn't
    //    SQL-expressible; the round-trip invariant is ──
    "s_warc_roundtrip" -> QueryDef(
      (spark, dir) => {
        val tmp = warcTmp + "/rt_" + dir.replaceAll("[^A-Za-z0-9]", "_")
        val p = new org.apache.hadoop.fs.Path(tmp)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        val docs = Tables.documents(spark, dir)
          .select(col("source"), col("doc_id"), col("text"))
        // eager checkpoint materializes the write job; the read below
        // depends on the files, not the lineage
        graft.sources.Warc.write(docs, tmp).localCheckpoint(eager = true)
        graft.sources.Warc.read(spark, s"$tmp/*.warc.gz").toDF()
          .select(col("uri"), sha2(col("payload"), 256).as("payload_sha256"),
            octet_length(col("payload")).cast("long").as("payload_len"))
          .orderBy(col("uri"))
      },
      """SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |  sha256(text) AS payload_sha256,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len
        |FROM documents ORDER BY uri""".stripMargin),

    // ── WARC V2 connector, index-only mode: the metadata projection is
    //    planned entirely from the .warc.cdx sidecars — the archives are
    //    never opened (a 100 TB crawl audit that reads only its index).
    //    Pushed payload_len filter prunes records at plan time ──
    "s_warc_source_meta" -> QueryDef(
      (spark, dir) => {
        val tmp = sharedWarcFixture(spark, dir)
        spark.read.format("graft.sources.WarcDataSource").load(tmp)
          .filter(col("payload_len") >= 200L)
          .select(col("uri"), col("payload_len"), col("payload_sha256"))
          .orderBy(col("uri"))
      },
      """SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
        |  sha256(text) AS payload_sha256
        |FROM documents
        |WHERE octet_length(CAST(text AS BLOB)) >= 200
        |ORDER BY uri""".stripMargin),

    // ── CDX selective fetch: pull ONLY the indexed records whose doc id
    //    ≡ 0 (mod 17) via (file, offset, length) ranged reads — bytes
    //    touched = Σ selected member sizes, not the archive. The fetched
    //    payloads must hash identically to the source rows ──
    "s_warc_cdx_fetch" -> QueryDef(
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val tmp = sharedWarcFixture(spark, dir)
        val wanted = spark.read.parquet(tmp + "/_cdx.parquet")
          .filter(expr("CAST(element_at(split(uri, '/'), -1) AS BIGINT) % 17 = 0"))
          .as[graft.sources.CdxEntry]
        graft.sources.Warc.fetchByCdx(tmp, wanted).toDF()
          .select(col("uri"), sha2(col("payload"), 256).as("payload_sha256"),
            octet_length(col("payload")).cast("long").as("payload_len"))
          .orderBy(col("uri"))
      },
      """SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |  sha256(text) AS payload_sha256,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len
        |FROM documents WHERE doc_id % 17 = 0 ORDER BY uri""".stripMargin),

    // ── WARC connector, pushed aggregation: the whole-crawl audit row
    //    (records, bytes, uri range, largest record) folds from the CDX
    //    sidecars — PushedAggregation in the scan, archives never
    //    opened, one partial row per index group shipped to the final
    //    merge ──
    "s_warc_index_stats" -> QueryDef(
      (spark, dir) => {
        val tmp = sharedWarcFixture(spark, dir)
        spark.read.format("graft.sources.WarcDataSource").load(tmp)
          .agg(count("*").as("n_records"),
            sum(col("payload_len")).as("total_bytes"),
            min(col("uri")).as("first_uri"),
            max(col("uri")).as("last_uri"),
            max(col("payload_len")).as("max_record"))
      },
      """SELECT CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  min('https://corpus.invalid/' || source || '/' || doc_id) AS first_uri,
        |  max('https://corpus.invalid/' || source || '/' || doc_id) AS last_uri,
        |  CAST(max(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_record
        |FROM documents""".stripMargin),

    // ── WARC connector, pushed GROUPED aggregation: per-archive stats
    //    (GROUP BY warc_file → COUNT/SUM/MIN/MAX) answered from the CDX
    //    sidecars alone — PushedAggregation + PushedGroupBy in the scan,
    //    one partial row per (file, group) to the final merge; at crawl
    //    scale a per-file audit reads kilobytes of index, not the gzip ──
    "s_warc_group_stats" -> QueryDef(
      (spark, dir) => {
        val tmp = sharedWarcFixture(spark, dir)
        spark.read.format("graft.sources.WarcDataSource").load(tmp)
          .groupBy(col("warc_file"))
          .agg(count("*").as("n_records"),
            sum(col("payload_len")).as("total_bytes"),
            min(col("uri")).as("first_uri"),
            max(col("uri")).as("last_uri"))
          .orderBy(col("warc_file"))
      },
      """SELECT source || '.warc.gz' AS warc_file,
        |  CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  min('https://corpus.invalid/' || source || '/' || doc_id) AS first_uri,
        |  max('https://corpus.invalid/' || source || '/' || doc_id) AS last_uri
        |FROM documents GROUP BY source ORDER BY warc_file""".stripMargin),

    // ── WARC connector, DISTINCT over the index-only scan: distinct
    //    aggregates are NOT pushable as partials (Spark only allows
    //    DISTINCT under complete pushdown, which would force one global
    //    partition — wrong at crawl scale). The scale-correct plan is the
    //    one below: column pruning keeps the scan in index-only mode
    //    (sidecars only, archives never opened) and Spark runs the
    //    distributed distinct over those index rows — per-file content
    //    dedup audit of a 100 TB crawl reading kilobytes of CDX ──
    "s_warc_distinct_stats" -> QueryDef(
      (spark, dir) => {
        val tmp = sharedWarcFixture(spark, dir)
        spark.read.format("graft.sources.WarcDataSource").load(tmp)
          .groupBy(col("warc_file"))
          .agg(count(lit(1)).as("n_records"),
            countDistinct(col("payload_sha256")).as("n_unique_payloads"),
            countDistinct(col("uri")).as("n_unique_uris"))
          .orderBy(col("warc_file"))
      },
      """SELECT source || '.warc.gz' AS warc_file,
        |  CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_unique_payloads,
        |  CAST(count(DISTINCT 'https://corpus.invalid/' || source || '/'
        |    || doc_id) AS BIGINT) AS n_unique_uris
        |FROM documents GROUP BY source ORDER BY warc_file""".stripMargin),

    // ── WARC connector, pushed TOP-N: "the k largest records in the
    //    crawl" (ORDER BY payload_len DESC LIMIT k) plans as PushedTopN —
    //    each CDX-indexed file ships only its own top-k index entries to
    //    Spark's TakeOrdered merge, archives never opened; the ORDER BY
    //    is a total order (uri tiebreak) so the per-file pre-merge can't
    //    change the answer ──
    "s_warc_top_payload" -> QueryDef(
      (spark, dir) => {
        val tmp = sharedWarcFixture(spark, dir)
        spark.read.format("graft.sources.WarcDataSource").load(tmp)
          .select(col("uri"), col("payload_len"), col("payload_sha256"))
          .orderBy(col("payload_len").desc, col("uri"))
          .limit(20)
      },
      """SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
        |  sha256(text) AS payload_sha256
        |FROM documents
        |ORDER BY payload_len DESC, uri LIMIT 20""".stripMargin),

    // ── cross-crawl revisit detection (the dedup accounting behind WARC
    //    `revisit` records): two crawl snapshots of the same sites —
    //    crawl A misses doc_id≡4 (mod 5) pages, crawl B recaptures
    //    everything with doc_id≡0 (mod 3) pages CHANGED since A. Each
    //    B capture classifies as revisit (digest unchanged → the crawler
    //    stores a pointer, not the payload), changed, or new, entirely
    //    from the CDX sidecars: both sides are INDEX-ONLY scans (uri,
    //    digest, length — archives never opened), the join shuffles at
    //    URI grain of the index, and `bytes` on the revisit row is the
    //    storage the revisit mechanism saves. Oracle recomputes both
    //    crawls' digests from the source rows ──
    "web_warc_revisit" -> QueryDef(
      (spark, dir) => {
        val root = revisitWarcFixture(spark, dir)
        val (tmpA, tmpB) = (root + "/a", root + "/b")
        val a = spark.read.format("graft.sources.WarcDataSource").load(tmpA)
          .select(col("uri").as("a_uri"), col("payload_sha256").as("a_digest"))
        val b = spark.read.format("graft.sources.WarcDataSource").load(tmpB)
          .select(col("uri"), col("payload_sha256").as("digest"),
            col("payload_len"))
        b.join(a, col("uri") === col("a_uri"), "left")
          .select(
            when(col("a_digest").isNull, lit("new"))
              .when(col("a_digest") === col("digest"), lit("revisit"))
              .otherwise(lit("changed")).as("status"),
            col("payload_len"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"), sum(col("payload_len")).as("bytes"))
          .orderBy(col("status"))
      },
      """WITH a AS (
        |  SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |    sha256(text) AS digest
        |  FROM documents WHERE doc_id % 5 <> 4),
        |b AS (
        |  SELECT 'https://corpus.invalid/' || source || '/' || doc_id AS uri,
        |    sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' upd'
        |                ELSE text END) AS digest,
        |    octet_length(CAST((CASE WHEN doc_id % 3 = 0 THEN text || ' upd'
        |                       ELSE text END) AS BLOB)) AS plen
        |  FROM documents)
        |SELECT CASE WHEN a.digest IS NULL THEN 'new'
        |            WHEN a.digest = b.digest THEN 'revisit'
        |            ELSE 'changed' END AS status,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(plen) AS BIGINT) AS bytes
        |FROM b LEFT JOIN a ON a.uri = b.uri
        |GROUP BY 1 ORDER BY status""".stripMargin),

    // ── JSONL ingest with dead-letter routing: render the corpus as
    //    JSONL, deterministically truncate every doc_id ≡ 0 (mod 37)
    //    line mid-token, ingest with Jsonl.readWithDlq — good rows parse,
    //    bad lines land verbatim in the DLQ, nothing throws. The id-sum
    //    proves the good leg parsed VALUES, not just counted lines ──
    "s_jsonl_dlq" -> QueryDef(
      (spark, dir) => {
        val tmp = "/tmp/graft_jsonl/dlq_" + dir.replaceAll("[^A-Za-z0-9]", "_")
        val p = new org.apache.hadoop.fs.Path(tmp)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        val js = to_json(struct(col("doc_id"), col("text")))
        Tables.documents(spark, dir)
          .select(when(col("doc_id") % 37 === 0, substring(js, 1, 10))
            .otherwise(js).as("value"))
          .write.mode("overwrite").text(tmp)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        val (good, dlq) = graft.core.io.Jsonl.readWithDlq(spark, tmp, schema)
        val g = good.agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
          .select(lit("ok").as("route"), col("n"), col("sum_ids"))
        val d = dlq.agg(count(lit(1)).as("n"))
          .select(lit("dlq").as("route"), col("n"),
            lit(null).cast("long").as("sum_ids"))
        d.unionAll(g).orderBy(col("route"))
      },
      """SELECT 'dlq' AS route, CAST(count(*) AS BIGINT) AS n,
        |  CAST(NULL AS BIGINT) AS sum_ids
        |FROM documents WHERE doc_id % 37 = 0
        |UNION ALL
        |SELECT 'ok', CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT)
        |FROM documents WHERE doc_id % 37 <> 0
        |ORDER BY route""".stripMargin)
  )
}
