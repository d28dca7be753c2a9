package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array, one md5 per TOKEN (the declarative
  * `transform(dims, d -> aggregate(tokens, ...))` form recomputes the md5
  * inside every (dim, token) lambda pair: 64× the hashing plus interpreted
  * HOF dispatch; measured 33 s → <1 s at sf0.1).
  *
  * Bit d ∈ [0,64): nibble = hex digit d/4 of the token md5, vote
  * += ((nibble >> (d%4)) & 1) * 2 - 1; signature bit = vote > 0.
  * Identical to TextAnalysis.simhashBits and the DuckDB oracle rendering.
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(toks.getUTF8String(i).getBytes)
      var d = 0
      while (d < 64) {
        // hex digit d/4 = high/low nibble of byte d/8
        val byte = digest(d / 8) & 0xff
        val nibble = if (d % 8 < 4) byte >> 4 else byte & 0xf
        votes(d) += ((nibble >> (d % 4)) & 1) * 2 - 1
        d += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var d = 0
    while (d < 64) { sb.append(if (votes(d) > 0) '1' else '0'); d += 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
