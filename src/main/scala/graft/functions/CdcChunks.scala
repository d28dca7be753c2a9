package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a string at positions where the hash
  * of the trailing w-char window hits a target — the CDC boundary rule of
  * rsync/LBFS-style dedup, with md5 standing in for the Rabin/gear
  * fingerprint so DuckDB can replay the exact boundaries
  * (`substr(md5(substr(text, i-w+1, w)), 32, 1) = '0'`).
  *
  * Char position i (1-based, i >= w) is a boundary iff the LAST hex digit
  * of md5(chars[i-w+1 .. i]) is '0' (expected chunk length 16·1 = one
  * boundary per 16 positions). Chunks are the spans between consecutive
  * boundaries plus the tail; a string shorter than w is one chunk.
  * Because boundaries depend only on LOCAL content, inserting or deleting
  * text resynchronizes within ~w chars — unlike fixed-offset blocks,
  * identical regions of two documents chunk identically no matter where
  * they sit, which is what makes chunk-hash dedup robust to edits.
  *
  * Positions are Java chars (= code points for ASCII/BMP input; the
  * synthetic corpus is ASCII, matching DuckDB's code-point substr).
  */
case class CdcChunksExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 0, "window must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0 // chunk start, 0-based inclusive
    var i = w     // candidate boundary = 1-based position i, chars [i-w, i)
    while (i <= len) {
      md.reset()
      val digest = md.digest(s.substring(i - w, i).getBytes("UTF-8"))
      if ((digest(15) & 0x0f) == 0) {
        chunks += UTF8String.fromString(s.substring(start, i))
        start = i
      }
      i += 1
    }
    if (start < len) chunks += UTF8String.fromString(s.substring(start, len))
    new GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunksExpr =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}
