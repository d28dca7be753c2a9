package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership probe over an array of string keys: true iff
  * ANY key has all `k` md5-derived bit positions set in the `m`-bit
  * filter. Bit position i of key g is the first 4 md5 hex chars of
  * "g#i" mod m — byte-for-byte the same value as `BloomDecon.position`
  * (= first two digest bytes, big-endian), so the declarative rendering
  * and the DuckDB oracle replay it exactly.
  *
  * Why it exists (r13 opt, guide §1.2 per-task work): the declarative
  * probe `exists(arr, g -> forall(array(pos_1..pos_k), p -> bitTest))`
  * materializes ALL k md5 positions per key before testing any bit —
  * through interpreted HOF lambdas that re-enter the expression
  * interpreter per element, with a 32-char hex string + conv() parse
  * per hash. This loop interleaves hash and bit test (a non-member
  * fails on the first unset bit — ~k× fewer digests at typical filter
  * densities), reads the position straight from the digest bytes, and
  * reuses one MessageDigest. Declarative parity is pinned by spec.
  *
  * Null semantics mirror `exists`: a null array is null; a null element
  * contributes "unknown" — the result is true if any key matches, else
  * null if any element was null, else false.
  */
case class BloomProbeExpr(child: Expression, bits: IndexedSeq[Long],
                          m: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(m % 64 == 0 && bits.length == m / 64,
    s"bits must hold m/64 words (m=$m, words=${bits.length})")

  override def dataType: DataType = BooleanType

  @transient private lazy val words: Array[Long] = bits.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    var sawNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { sawNull = true }
      else {
        val g = arr.getUTF8String(i).getBytes
        var allSet = true
        var h = 1
        while (allSet && h <= k) {
          md.reset()
          md.update(g)
          md.update('#'.toByte)
          md.update(h.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val d = md.digest()
          // first 4 hex chars = first 2 digest bytes, big-endian, then mod m
          val p = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % m
          if ((words(p >>> 6) & (1L << (p & 63))) == 0L) allSet = false
          h += 1
        }
        if (allSet) return true
      }
      i += 1
    }
    if (sawNull) null else false
  }

  override protected def withNewChildInternal(c: Expression): BloomProbeExpr =
    copy(child = c)
  override def prettyName: String = "bloom_probe"
}
