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

/** MinHash signature with ONE md5 per shingle: the shingle hashes once to
  * a 31-bit value h (md5's first 4 bytes, sign bit cleared), and the k
  * permutations are Carter-Wegman mixes `(a_s·h + b_s) mod (2^31-1)` with
  * fixed constants a_s, b_s < 10^9+7. All products stay < 2^61, so the
  * arithmetic is exact in any 64-bit engine — the overflow hazard that
  * originally motivated the k-md5 string family doesn't apply at these
  * bounds. 12× less hash CPU at k=12 in the kernel that dominates every
  * MinHash dedup stage.
  *
  * sig_s = min over shingles of (a_s·h(g) + b_s) mod M,
  *   h(g) = first-8-hex(md5(g)) & 0x7FFFFFFF,
  *   a_s  = (2654435761·(s+1)) mod (10^9+7),
  *   b_s  = (40503·(s+7)) mod (10^9+7),  M = 2147483647.
  */
case class MinHashIntSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  private val M = 2147483647L
  private lazy val aConst = Array.tabulate(k)(s => (2654435761L * (s + 1)) % 1000000007L)
  private lazy val bConst = Array.tabulate(k)(s => (40503L * (s + 7)) % 1000000007L)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 hex chars = first 4 bytes big-endian, sign bit cleared
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x7fffffffL
      var s = 0
      while (s < k) {
        val mixed = (aConst(s) * h + bConst(s)) % M
        if (mixed < mins(s)) mins(s) = mixed
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  override protected def withNewChildInternal(c: Expression): MinHashIntSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_int_sig"
}
