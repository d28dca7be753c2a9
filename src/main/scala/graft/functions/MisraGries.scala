package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Misra-Gries frequent-items summary: at most k counters.
  *
  * Invariant (the MG guarantee): for every item x,
  * `true_count(x) - n/(k+1) <= est(x) <= true_count(x)` where n is the
  * number of rows summarized — so ANY item with true count > n/(k+1) is
  * guaranteed a surviving counter, regardless of input order or how
  * partial summaries were merged (Agarwal et al., "Mergeable Summaries",
  * PODS'12: merging two summaries and re-pruning to k counters preserves
  * the combined error bound). Counter VALUES are order-dependent; only
  * the superset guarantee is — which is why [[graft.ops.HeavyHitters]]
  * never exposes estimates, only the exact-recounted survivors.
  */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, weight: Long): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None if counts.size < k => counts.update(item, weight)
      case None =>
        // decrement-all by the incoming weight, clamped at the smallest
        // current counter so no counter goes negative; leftover weight
        // (if the decrement zeroed slots) claims a freed slot
        val dec = math.min(weight, counts.valuesIterator.min)
        prune(dec)
        if (weight > dec && counts.size < k) counts.update(item, weight - dec)
    }
  }

  /** Subtract `dec` from every counter, dropping non-positives. */
  def prune(dec: Long): Unit = {
    if (dec > 0) {
      val dead = mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { key =>
        val c = counts(key) - dec
        if (c > 0) counts.update(key, c) else dead += key
      }
      dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries combine: add counters, then if over k survivors
    * subtract the (k+1)-th largest combined value from all (the smallest
    * decrement that restores <= k counters).
    */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    if (counts.size > k) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      prune(vals(vals.length - 1 - k)) // (k+1)-th largest
    }
  }
}

/** `misra_gries(item, k)` — bounded-memory frequent-items aggregate with
  * map-side partial aggregation: each partition keeps <= k counters, the
  * exchange carries <= k (item, est) pairs per partition, and merges
  * re-prune to k. Output: array<struct<item, est>> by (est desc, item) —
  * a CANDIDATE set (superset of all items with count > n/(k+1)), to be
  * exact-recounted before anything downstream trusts the numbers.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val sorted = buffer.counts.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "misra_gries"
}
