package graft.core.archive

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, InputStream}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.{GzipCompressorInputStream, GzipCompressorOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One extracted archive entry (S7). `source` is the archive it came from
  * (bag id), `name` has any leading `./` stripped
  * (s3_lib/s3_lib/tar_lib.py:52-54).
  */
final case class TarEntry(source: String, name: String, bytes: Array[Byte],
                          mtime: Long, isDir: Boolean)

/** Items recorded for a packed archive (tar_lib.py:96-104); `sha256` is
  * the digest of the final .tar.gz bytes (the reference publishes it as
  * the `<archive>.sha256` object next to the archive).
  */
final case class TarItem(name: String, size: Long)
final case class PackedArchive(bagId: String, path: String, items: Seq[TarItem],
                               sha256: String)

/** S7 (tar explode) + K2/K3 (tar package) — SURVEY §2.1/§2.2.
  *
  * The reference reads whole archives into RAM (tar_lib.py:45,87). Here
  * extraction opens an `FSDataInputStream` per archive path and decodes
  * entry-by-entry, and packing is a sorted `groupByKey(bagId)` writing
  * straight to a Hadoop output stream — per-task memory is bounded by the
  * largest single ENTRY, not the archive, and there is no `binaryFile`
  * 2 GB whole-archive-row cap (SURVEY §7.4 "100 TB scale").
  */
object Tar {

  private def open(name: String, in: InputStream): TarArchiveInputStream = {
    val buffered = new BufferedInputStream(in)
    if (name.endsWith(".gz") || name.endsWith(".tgz"))
      new TarArchiveInputStream(new GzipCompressorInputStream(buffered))
    else new TarArchiveInputStream(buffered)
  }

  /** Iterate entries of one archive stream, buffering one entry at a time;
    * the stream (and `in` under it) is closed when the last entry is
    * consumed.
    */
  def entriesFromStream(archiveName: String, in: InputStream): Iterator[TarEntry] = {
    val tin = open(archiveName, in)
    Iterator.continually(tin.getNextEntry)
      .takeWhile { e => if (e == null) tin.close(); e != null }
      .map { e =>
        val name = e.getName.stripPrefix("./")
        val content =
          if (e.isDirectory) Array.emptyByteArray
          else {
            val buf = new java.io.ByteArrayOutputStream(math.max(64, e.getSize.toInt))
            val chunk = new Array[Byte](64 * 1024)
            var n = tin.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = tin.read(chunk) }
            buf.toByteArray
          }
        TarEntry(archiveName, name, content, e.getModTime.getTime / 1000L, e.isDirectory)
      }
  }

  /** Iterate entries of one in-memory archive (small side archives; the
    * scan path uses `entriesFromStream`).
    */
  def entries(archiveName: String, bytes: Array[Byte]): Iterator[TarEntry] =
    entriesFromStream(archiveName, new ByteArrayInputStream(bytes))

  /** Explode archives read via `spark.read.format("binaryFile")` into one
    * row per entry (whole-archive rows — subject to the 2 GB row cap; kept
    * for frames already holding archive bytes).
    */
  def explode(binaryFiles: DataFrame): Dataset[TarEntry] = {
    val spark = binaryFiles.sparkSession
    import spark.implicits._
    binaryFiles.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val base = path.split("/").last
        entries(base, bytes).map(e => e.copy(source = base))
      }
  }

  /** Streaming scan: list archive paths under `glob` (driver-side catalog
    * listing, one status per archive), distribute the paths, and have each
    * task open its archive's `FSDataInputStream` directly — entries decode
    * one at a time, so archives of ANY size scan in bounded memory. One
    * archive per task; many archives extract in parallel.
    */
  def explodePath(spark: SparkSession, glob: String,
                  pathFilter: String => Boolean = _ => true): Dataset[TarEntry] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pathFilter prunes BEFORE any archive opens — a retry pass over a few
    // failing bags re-reads only those archives
    val paths = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).filter(pathFilter).toSeq
    val parallelism = math.max(1, math.min(paths.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(paths)
      .repartition(parallelism)
      .flatMap { path =>
        val hp = new Path(path)
        val in = hp.getFileSystem(conf.value).open(hp)
        entriesFromStream(hp.getName, in)
      }
  }

  /** K3 prefix substitution, reference semantics (tar_lib.py:159-160
    * `s3_object.replace(drop, '', 1)` then f'{add}{...}'): remove the FIRST
    * occurrence of `drop` anywhere in the name, then unconditionally
    * prepend `add` — even when `drop` never matched.
    */
  def substitutePrefix(name: String, drop: String, add: String): String = {
    val idx = if (drop.isEmpty) -1 else name.indexOf(drop)
    val stripped =
      if (idx < 0) name
      else name.substring(0, idx) + name.substring(idx + drop.length)
    add + stripped
  }

  /** K2/K3: pack each bag's entries into `<outDir>/<bagId>.tar.gz`,
    * streaming entries to a Hadoop stream in `orderCol` order —
    * `flatMapSortedGroups` sorts within groups during the shuffle, so the
    * entry order (and the recorded item list, and the archive bytes) is
    * deterministic across runs and task retries, like the reference's
    * caller-order tar_lib.py:96-125. Returns one row per archive with the
    * recorded item list (name, size).
    */
  def packageBags(entries: Dataset[TarEntry], outDir: String,
                  prefixDrop: String = "", prefixAdd: String = "",
                  mtimeSeconds: Option[Long] = None,
                  orderCol: String = "name"): Dataset[PackedArchive] = {
    val spark = entries.sparkSession
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    entries.groupByKey(_.source)
      .flatMapSortedGroups(col(orderCol)) { (bagId, it) =>
        val outPath = new Path(outDir, s"$bagId.tar.gz")
        val fs = outPath.getFileSystem(hadoopConf.value)
        // digest the FINAL compressed bytes while they stream out — the
        // reference publishes sha256(<archive>.tar.gz) as a sidecar object
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val out = new TarArchiveOutputStream(
          new GzipCompressorOutputStream(new java.security.DigestOutputStream(
            new BufferedOutputStream(fs.create(outPath, true)), md)))
        out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
        val items = Seq.newBuilder[TarItem]
        try {
          it.filterNot(_.isDir).foreach { e =>
            val name = substitutePrefix(e.name, prefixDrop, prefixAdd)
            val te = new TarArchiveEntry(name)
            te.setSize(e.bytes.length.toLong)
            te.setModTime(mtimeSeconds.getOrElse(e.mtime) * 1000L)
            out.putArchiveEntry(te)
            out.write(e.bytes)
            out.closeArchiveEntry()
            items += TarItem(name, e.bytes.length.toLong)
          }
        } finally out.close()
        val sha = md.digest().map("%02x".format(_)).mkString
        // `<archive>.tar.gz.sha256` sidecar, "<hex>  <name>" like the
        // manifest rows checksum validation consumes
        val shaPath = new Path(outDir, s"$bagId.tar.gz.sha256")
        val sout = fs.create(shaPath, true)
        try sout.write(s"$sha  $bagId.tar.gz\n".getBytes("UTF-8")) finally sout.close()
        Iterator.single(PackedArchive(bagId, outPath.toString, items.result(), sha))
      }
  }
}
