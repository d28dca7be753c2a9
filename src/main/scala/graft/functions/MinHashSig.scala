package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over an array of shingles:
  * `sig(s) = min over shingles of md5("<s>:" + shingle)` for s ∈ [0, k).
  *
  * Semantically identical to the declarative
  * `transform(seq, s -> array_min(transform(shingles, g -> md5(...))))`
  * but evaluates the shingle array once and runs one tight loop with a
  * reused MessageDigest — the nested-lambda form re-evaluates the shingle
  * subtree k times per row through interpreted higher-order functions
  * (measured 141 s → ~2 s for 5 000 docs × k=12).
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](k)
    val md = java.security.MessageDigest.getInstance("MD5")
    var s = 0
    while (s < k) {
      val prefix = (s.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var best: String = null
      var i = 0
      while (i < n) {
        val shingle = arr.getUTF8String(i)
        md.reset()
        md.update(prefix)
        md.update(shingle.getBytes)
        val h = toHex(md.digest())
        if (best == null || h.compareTo(best) < 0) best = h
        i += 1
      }
      mins(s) = if (best == null) "" else best
      s += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}
