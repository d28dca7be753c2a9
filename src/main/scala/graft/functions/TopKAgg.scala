package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Mutable bounded top-k buffer: a size-k priority queue with the WORST
  * element on top (lowest sim, then highest id), so insert+evict is
  * O(log k) and memory is O(k) per group regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](TopKByDescExpr.worstFirst)
  def add(sim: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((sim, id))
    else if (TopKByDescExpr.worstFirst.compare((sim, id), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((sim, id))
    }
  }
}

object TopKByDescExpr {
  /** "Greater" = worse = lower score, then higher id — so the queue's max
    * (dequeue target) is always the eviction candidate, and ties keep the
    * smaller id (matching `row_number over (order by sim desc, nid)`).
    */
  val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }
}

/** Top-k pushdown aggregate: keeps the k best (score, id) pairs per group
  * in a bounded heap, with map-side partial aggregation — the plan shows
  * `partial_topk_by` before the exchange, so only ≤k rows per group per
  * partition ever shuffle, instead of ranking ALL rows through a window's
  * full partition sort. Output: array<struct<nid, sim, rank>> ordered by
  * (sim desc, nid asc), rank 1-based — exactly `row_number` semantics.
  */
case class TopKByDescExpr(score: Expression, id: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buffer.add(s, i) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    // "smallest" under worstFirst = best ⇒ ascending sort is best-first
    val sorted = buffer.heap.toArray.sorted(TopKByDescExpr.worstFirst)
    new GenericArrayData(sorted.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, r + 1)
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDescExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDescExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByDescExpr =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by"
}
