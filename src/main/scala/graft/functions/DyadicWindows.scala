package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All dyadic-window hashes of a string in one pass: for each level L in
  * `levels` (each ≤ 127) and each start position p with p+L ≤ n, emit the
  * PACKED key `(hash & ~127) | L` of the L-code-point window at p, as
  * array<long> — level in the 7 low bits, 57 hash bits above. Packing
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
  * Windows are over CODE POINTS, matching SQL `substr` semantics on
  * supplementary-plane text.
  */
case class DyadicWindowHashesExpr(child: Expression, levels: Seq[Int])
    extends UnaryExpression with CodegenFallback {

  require(levels.nonEmpty && levels == levels.sorted && levels.head >= 1 &&
    levels.last <= 127, "levels must be ascending, in [1, 127]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 1000003L // odd polynomial base, wraps mod 2^64

  private def fmix(h: Long, lvl: Int): Long = {
    var z = h ^ (lvl.toLong * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def pack(h: Long, lvl: Int): Long = (fmix(h, lvl) & ~127L) | lvl

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    var total = 0
    levels.foreach { l => if (n >= l) total += n - l + 1 }
    val out = new Array[Long](total)
    var k = 0
    levels.foreach { l =>
      if (n >= l) {
        // B^(l-1) mod 2^64 for the roll-off term
        var pow = 1L
        var i = 1
        while (i < l) { pow *= B; i += 1 }
        var h = 0L
        i = 0
        while (i < l) { h = h * B + cps(i); i += 1 }
        out(k) = pack(h, l); k += 1
        var p = 1
        while (p + l <= n) {
          h = (h - cps(p - 1) * pow) * B + cps(p + l - 1)
          out(k) = pack(h, l); k += 1
          p += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(c: Expression): DyadicWindowHashesExpr =
    copy(child = c)
  override def prettyName: String = "dyadic_window_hashes"
}
