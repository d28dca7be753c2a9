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
        |FROM documents ORDER BY name""".stripMargin)
  )
}
