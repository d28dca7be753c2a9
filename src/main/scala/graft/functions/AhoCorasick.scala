package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern scan (Aho & Corasick, CACM 1975): per-row
  * occurrence counts of EVERY pattern in one pass over the text's UTF-8
  * bytes — the blocklist/term-watch primitive of corpus curation, where
  * a per-pattern `regexp`/`replace` chain costs k scans per document and
  * an interpreted HOF re-evaluates the text subtree per pattern.
  *
  * Counting semantics: ALL occurrences, overlapping included (every
  * dictionary suffix reached via the fail-chain closure is credited).
  * For self-border-free patterns (no proper prefix that is also a
  * suffix) this equals the left-to-right non-overlapping count of the
  * declarative `(len(t) − len(replace(t, p, ''))) / len(p)` rendering —
  * the parity the oracle uses; the divergence on bordered patterns like
  * "aa" is pinned by spec.
  *
  * Layout: the goto function is a single open-addressed long→int table
  * keyed by (state << 8 | byte) — O(total pattern bytes) memory
  * regardless of alphabet, the same in-expression open-addressing the
  * engine uses for dyadic window keys; misses walk fail links (amortized
  * O(1) per input byte). Output pattern-ids are closure-merged per state
  * at build, so scan-time work per byte is one probe + (rarely) a short
  * fail walk + crediting any matches ending there. The automaton is
  * built once per executor thread (`@transient lazy`), never shipped.
  */
case class AhoCorasickCountExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "need at least one non-empty pattern")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // (edges open-address table, fail links, per-state matched pattern ids)
  @transient private lazy val auto: (Array[Long], Array[Int], Array[Array[Int]]) = {
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    val maxStates = pats.map(_.length).sum + 1
    // trie as adjacency lists first (byte-sparse)
    val kids = Array.fill(maxStates)(scala.collection.mutable.LongMap.empty[Int])
    val out = Array.fill(maxStates)(List.empty[Int])
    var n = 1
    var pi = 0
    while (pi < pats.length) {
      var s = 0
      val p = pats(pi)
      var i = 0
      while (i < p.length) {
        val c = (p(i) & 0xff).toLong
        s = kids(s).getOrElse(c, { kids(s)(c) = n; n += 1; n - 1 })
        i += 1
      }
      out(s) ::= pi
      pi += 1
    }
    // BFS fail links + output closure
    val fail = new Array[Int](n)
    val outArr = new Array[Array[Int]](n)
    outArr(0) = out(0).toArray
    val q = scala.collection.mutable.Queue.empty[Int]
    kids(0).foreach { case (_, s) => fail(s) = 0; q.enqueue(s) }
    while (q.nonEmpty) {
      val r = q.dequeue()
      outArr(r) = (out(r) ++ outArr(fail(r)).toList).toArray
      kids(r).foreach { case (c, u) =>
        var f = fail(r)
        while (f != 0 && !kids(f).contains(c)) f = fail(f)
        fail(u) = kids(f).getOrElse(c, 0) match {
          case `u` => 0 // the only root child on c is u itself
          case v => v
        }
        q.enqueue(u)
      }
    }
    // open-addressed (state<<8|byte) → next, power-of-two sized, ≥2× load
    var cap = java.lang.Integer.highestOneBit(math.max(4, n * 4) - 1) << 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Int](cap)
    def put(k: Long, v: Int): Unit = {
      var i = (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & (cap - 1)
      keys(i) = k; vals(i) = v
    }
    var s = 0
    while (s < n) {
      kids(s).foreach { case (c, u) => put((s.toLong << 8) | c, u) }
      s += 1
    }
    // pack (keys, vals) into one long array: key in [0], val in low bits of
    // a paired slot is overkill — keep two arrays via a tuple-free encode:
    // store vals inline by widening keys table to (key, val) pairs.
    val packed = new Array[Long](cap * 2)
    var i = 0
    while (i < cap) {
      packed(2 * i) = keys(i); packed(2 * i + 1) = vals(i).toLong; i += 1
    }
    (packed, fail, outArr)
  }

  private def step(packed: Array[Long], state: Int, c: Int): Int = {
    val cap = packed.length >> 1
    val k = (state.toLong << 8) | c
    var i = (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt
    while (true) {
      val kk = packed(2 * i)
      if (kk == k) return packed(2 * i + 1).toInt
      if (kk == -1L) return -1
      i = (i + 1) & (cap - 1)
    }
    -1
  }

  override def nullSafeEval(input: Any): Any = {
    val (packed, fail, outArr) = auto
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      var nx = step(packed, s, c)
      while (nx < 0 && s != 0) { s = fail(s); nx = step(packed, s, c) }
      s = if (nx < 0) 0 else nx
      val hits = outArr(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickCountExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_counts"
}
