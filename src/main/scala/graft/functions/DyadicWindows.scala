package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All DISTINCT dyadic-window hashes of a string in one pass: for each
  * level L in `levels` (each ≤ 127) and each start position p with
  * p+L ≤ n, emit the PACKED key `(hash & ~127) | L` of the L-code-point
  * window at p — deduplicated per call (the span profile only consumes
  * the per-doc window SET, so repeated windows never leave the scan) —
  * as array<long>: level in the 7 low bits, 57 hash bits above. Packing
  * keeps the per-window payload one primitive long (UnsafeArrayData, no
  * boxing, no struct rows) and makes the downstream shuffle key a single
  * 8-byte column.
  *
  * The declarative form (`explode(positions) → substr → xxhash64`)
  * allocates one substring per (position, level) and re-hashes every
  * window from scratch: O(n·ΣL) char work. Here each level is a rolling
  * polynomial hash — O(1) per step after the first window, O(n·|levels|)
  * total — finalized with a splitmix64 mix (keyed by the level) so the
  * linear structure of the raw polynomial can't manufacture collisions
  * between related windows. The key is only ever an equality key (the
  * oracle replays with raw substrings), so any deterministic
  * equality-preserving function is semantically safe; collision odds are
  * ~2⁻⁵⁷ per same-level pair.
  *
  * WINNOWING SAMPLING (`sampleFromLevel`, `sampleWindow` = w): levels ≥
  * `sampleFromLevel` emit only the windows a Schleimer-Wilkerson-Aiken
  * winnow selects — per position, an ANCHOR hash of the first 8 code
  * points (base-31 polynomial, Lehmer-mixed mod 2³¹−1), packed with a
  * rightmost-position tiebreak; each sliding frame of w consecutive
  * positions keeps its minimum, and the distinct kept positions emit
  * their full L-window rolling hash. Density drops to ~2/(w+1) of
  * stride-1 while keeping the winnowing cover guarantee: two docs
  * sharing a run of ≥ L+w−1 code points share a selected window
  * (the anchor values inside the shared run are content-equal, so both
  * winnows keep the same minimum). The selection arithmetic is chosen to
  * be EXACTLY replayable in plain SQL — no wrapping multiplication, no
  * engine hash: anchor = Σ cp(p+i)·31^(7−i) (< 2⁵⁶), mix =
  * ((anchor mod 2³¹−1)·48271) mod 2³¹−1, key = mix·2²¹ + (2²¹−1−p) with
  * p the 1-based position — so a DuckDB oracle selects the identical
  * positions and groups by the raw substring. The 2²¹ position packing
  * caps sampled docs at 2²¹−2 code points (~2 MB of ASCII) — enforced
  * with a require in `winnowSelect`; pre-split longer documents.
  *
  * Windows are over CODE POINTS, matching SQL `substr` semantics on
  * supplementary-plane text.
  */
case class DyadicWindowHashesExpr(child: Expression, levels: Seq[Int],
                                  sampleFromLevel: Int = Int.MaxValue,
                                  sampleWindow: Int = 16)
    extends UnaryExpression with CodegenFallback {

  require(levels.nonEmpty && levels == levels.sorted && levels.head >= 1 &&
    levels.last <= 127, "levels must be ascending, in [1, 127]")
  require(sampleFromLevel >= 9,
    "sampled levels need the 8-code-point anchor inside the window")
  require(sampleWindow >= 1 && sampleWindow <= 2048, "sampleWindow in [1, 2048]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 1000003L // odd polynomial base, wraps mod 2^64

  private def fmix(h: Long, lvl: Int): Long = {
    var z = h ^ (lvl.toLong * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def pack(h: Long, lvl: Int): Long = (fmix(h, lvl) & ~127L) | lvl

  /** Lehmer-mixed base-31 anchor of cps[i..i+7], exact in int64 (and in
    * SQL BIGINT: max raw value ≈ 3.2e16, no wrap anywhere).
    */
  private def anchorMixes(cps: Array[Int]): Array[Long] = {
    val n = cps.length
    if (n < 8) return Array.emptyLongArray
    val out = new Array[Long](n - 7)
    val p7 = 27512614111L // 31^7
    var a = 0L
    var i = 0
    while (i < 8) { a = a * 31L + cps(i); i += 1 }
    out(0) = ((a % 2147483647L) * 48271L) % 2147483647L
    i = 1
    while (i + 7 < n) {
      a = (a - cps(i - 1) * p7) * 31L + cps(i + 7)
      out(i) = ((a % 2147483647L) * 48271L) % 2147483647L
      i += 1
    }
    out
  }

  /** Winnow-selected flags over positions 0..nPos-1: frame p covers
    * [p, p+w-1] (clamped at the tail — a short doc still selects), keep
    * the frame minimum of mix·2²¹+(2²¹−1−(i+1)), rightmost tiebreak.
    */
  private def winnowSelect(mix: Array[Long], nPos: Int, w: Int): Array[Boolean] = {
    // key = mix·2²¹ + (2²¹−1−(p+1)) needs p+1 < 2²¹ or the tail term goes
    // negative, corrupting the rightmost-min tiebreak AND the documented
    // SQL-parity contract — fail loudly instead (the level ≤ 127 guard
    // has the same posture). 2²¹−2 code points ≈ a 2 MB+ single document;
    // winnow callers should pre-split monster docs, not widen the packing.
    require(nPos + 1 < 2097152,
      s"winnow sampling caps documents at ${2097152 - 2} code points " +
        s"(got $nPos positions) — the 2^21 position packing in the " +
        "selection key is exact-SQL-replayable only below that bound")
    val keys = new Array[Long](nPos)
    var i = 0
    while (i < nPos) { keys(i) = mix(i) * 2097152L + (2097151L - (i + 1)); i += 1 }
    val sel = new Array[Boolean](nPos)
    val dq = new java.util.ArrayDeque[Integer]()
    def push(j: Int): Unit = {
      while (!dq.isEmpty && keys(dq.peekLast) > keys(j)) dq.pollLast()
      dq.addLast(j)
    }
    var j = 0
    val fill = math.min(w, nPos)
    while (j < fill) { push(j); j += 1 }
    var p = 0
    while (p < nPos) {
      while (dq.peekFirst < p) dq.pollFirst()
      sel(dq.peekFirst) = true
      val enter = p + w
      if (enter < nPos) push(enter)
      p += 1
    }
    sel
  }

  /** Open-addressing long set for the per-doc emission dedup. 0 is a safe
    * empty sentinel: every packed value carries its level in the 7 low
    * bits and levels are ≥ 1, so 0 is never a legal emission.
    */
  private final class LongSet(expected: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(16, expected * 2 - 1)) * 2
    private var slots = new Array[Long](cap)
    private var n = 0
    /** @return true when v was newly added */
    def add(v: Long): Boolean = {
      if (n * 2 >= cap) grow()
      var i = (java.lang.Long.hashCode(v * 0x9E3779B97F4A7C15L)) & (cap - 1)
      while (true) {
        val s = slots(i)
        if (s == 0L) { slots(i) = v; n += 1; return true }
        if (s == v) return false
        i = (i + 1) & (cap - 1)
      }
      false
    }
    private def grow(): Unit = {
      val old = slots
      cap *= 2
      slots = new Array[Long](cap)
      n = 0
      old.foreach(v => if (v != 0L) add(v))
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](n)
    // per-doc DISTINCT at emission: the downstream span profile only ever
    // wants the per-doc window SET, and each doc is one expression call —
    // deduping here makes the exploded (id, pk) frame globally distinct,
    // so the repeated-8-gram mass of natural text never reaches the
    // exchange and the post-shuffle dropDuplicates hash-agg disappears
    val seen = new LongSet(n)
    lazy val mixes = anchorMixes(cps)
    levels.foreach { l =>
      if (n >= l) {
        val nPos = n - l + 1
        val sel: Array[Boolean] =
          if (l >= sampleFromLevel) winnowSelect(mixes, nPos, sampleWindow)
          else null
        // B^(l-1) mod 2^64 for the roll-off term
        var pow = 1L
        var i = 1
        while (i < l) { pow *= B; i += 1 }
        var h = 0L
        i = 0
        while (i < l) { h = h * B + cps(i); i += 1 }
        if (sel == null || sel(0)) { val k = pack(h, l); if (seen.add(k)) out += k }
        var p = 1
        while (p + l <= n) {
          h = (h - cps(p - 1) * pow) * B + cps(p + l - 1)
          if (sel == null || sel(p)) { val k = pack(h, l); if (seen.add(k)) out += k }
          p += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): DyadicWindowHashesExpr =
    copy(child = c)
  override def prettyName: String = "dyadic_window_hashes"
}
