package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi unigram segmentation value (see `text.Unigram`): DP
  * over the word's first `maxWord` chars, v = cost·16 + piece count,
  * minimum over all segmentations into vocab subwords of length
  * ≤ `maxSub`. The declarative rendering (`Unigram.withSegmentValue`)
  * probes a LITERAL map per (j, i) span — Catalyst's GetMapValue is a
  * linear scan over the map entries, ~88 UTF8 comparisons per lookup ×
  * 48 spans per token. Here: one java HashMap probe per span — measured
  * 25.9 s → sub-second on the sf0.1 corpus. Semantics identical
  * (UnigramSpec pins native-vs-declarative parity; the
  * `text_unigram_segment` oracle replays the DP in SQL).
  */
case class UnigramSegExpr(child: Expression, vocab: Map[String, Long],
                          maxSub: Int, maxWord: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private val Inf = 1000000000000000L

  @transient private lazy val m: java.util.HashMap[UTF8String, java.lang.Long] = {
    val h = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => h.put(UTF8String.fromString(k), v) }
    h
  }

  override def nullSafeEval(word: Any): Any = {
    val w = word.asInstanceOf[UTF8String]
    val s = if (w.numChars() > maxWord) w.substringSQL(1, maxWord) else w
    val n = s.numChars()
    if (n == 0) return 0L
    val b = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = Inf
      var j = math.max(0, i - maxSub)
      while (j < i) {
        if (b(j) < Inf) {
          val c = m.get(s.substringSQL(j + 1, i - j))
          if (c != null) {
            val v = b(j) + c.longValue() * 16 + 1
            if (v < best) best = v
          }
        }
        j += 1
      }
      b(i) = best
      i += 1
    }
    b(n)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegExpr =
    copy(child = newChild)
  override def prettyName: String = "unigram_seg"
}
