package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface archive explode (S7 as a LATERAL VIEW / generator):
  * `tar_explode(archive_name, archive_bytes)` emits one row per tar
  * entry — (name, bytes, mtime, is_dir) — decoding tar and tar.gz/tgz by
  * the archive name's extension, exactly [[graft.core.archive.Tar.entries]]
  * (the reference's tar_lib explode, s3_lib/s3_lib/tar_lib.py:52-54).
  *
  * This is the in-memory-row form (an archive already held as one binary
  * cell, e.g. from `spark.read.format("binaryFile")` or a payload column
  * of the WARC source) and inherits its 2 GB row cap; the scan path for
  * arbitrarily large archives remains [[graft.core.archive.Tar.explodePath]],
  * which streams entries straight off the filesystem without ever
  * materializing the archive. Entries decode lazily one at a time — the
  * generator never holds the exploded set in memory.
  */
case class TarExplodeExpr(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("bytes", BinaryType),
    StructField("mtime", LongType, nullable = false),
    StructField("is_dir", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 2)
      TypeCheckResult.TypeCheckFailure("tar_explode(name, bytes) takes 2 arguments")
    else if (children.head.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("tar_explode: name must be STRING")
    else if (children(1).dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("tar_explode: bytes must be BINARY")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = children.head.eval(input)
    val b = children(1).eval(input)
    if (n == null || b == null) Iterator.empty
    else graft.core.archive.Tar
      .entries(n.asInstanceOf[UTF8String].toString, b.asInstanceOf[Array[Byte]])
      .map(e => InternalRow(UTF8String.fromString(e.name), e.bytes, e.mtime,
        e.isDir))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TarExplodeExpr =
    copy(children = newChildren)
  override def prettyName: String = "tar_explode"
}
