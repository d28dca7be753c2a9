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

/** One-permutation-hashing MinHash signature (Li, Owen, Zhang NIPS'12)
  * with rotation densification (Shrivastava & Li ICML'14): ONE cheap
  * hash per shingle, no per-shingle k-loop and no md5 at all — the cost
  * that made the k-mix family the 100×-probe wall (345 s: MessageDigest
  * over every shingle of every doc).
  *
  * Per shingle g: h = Lehmer-mixed base-31 polynomial of g's code
  * points — `a = fold(cp: a·31 + cp mod M)`, `h = a·48271 mod M`,
  * M = 2³¹−1 (the [[DyadicWindowHashesExpr]] anchor family — exact in
  * int64 AND in SQL BIGINT: every intermediate < 2⁶³). The shingle
  * lands in bin `h mod k` carrying value `(2654435761·h + 40503) mod M`
  * (one Carter-Wegman mix so bin-id bits don't correlate with the
  * value); each bin keeps its min. Empty bin j borrows from the first
  * non-empty bin to its right (circular): `sig_j = sig_{(j+t) mod k} +
  * t·M` — the +t·M offset keeps two docs that borrowed from different
  * distances from matching spuriously (the ICML'14 rotation scheme).
  * All final values < k·M < 2³⁵. An empty shingle set yields all −1.
  *
  * Estimator quality: P(sig_a[j] = sig_b[j]) ≈ J(a,b) with variance ≤
  * the k-permutation family's for docs with ≥ k shingles (one
  * permutation sampled WITHOUT replacement across bins); the LSH
  * banding S-curve applies unchanged. Collision regime matches the
  * int-sig family (31-bit h).
  */
case class OphMinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  private val M = 2147483647L

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var a = 0L
      var p = 0
      while (p < s.length) {
        val cp = s.codePointAt(p)
        a = (a * 31L + cp) % M
        p += Character.charCount(cp)
      }
      val h = (a * 48271L) % M
      val b = (h % k).toInt
      val value = (2654435761L * h + 40503L) % M
      if (value < bins(b)) bins(b) = value
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (bins(j) != Long.MaxValue) out(j) = bins(j)
      else {
        var t = 1
        var found = -1L
        while (t < k && found < 0) {
          val src = bins((j + t) % k)
          if (src != Long.MaxValue) found = src + t.toLong * M
          t += 1
        }
        out(j) = if (found >= 0) found else -1L
      }
      j += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  override protected def withNewChildInternal(c: Expression): OphMinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "oph_minhash_sig"
}
