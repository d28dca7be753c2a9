package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — SURVEY §2.10 preference (c): a whole-operator
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, for semantics the
  * built-in operators can't express without row expansion.
  *
  * Semantics (same as `graft.ops.AsofJoin.join`, which composes it from a
  * tag-union + running window): for every left row attach the payload of
  * the LATEST right row with `right.ts <= left.ts` for the same key
  * (reference lookup shape: tre_editorial_integration.py's
  * latest-prior-state reload; oracle = DuckDB's native ASOF LEFT JOIN).
  *
  * Why a custom plan beats the composition at scale:
  *   - each side shuffles ON ITS OWN KEY with its own row width — the
  *     union approach widens every row to the union schema (left columns
  *     null-padded onto right rows and vice versa) before one big sort;
  *   - the merge is a single forward pass per co-partition holding ONE
  *     buffered right row — no window-function state, no post-filter that
  *     discards the right side's rows after sorting them;
  *   - Catalyst still owns distribution + ordering: the exec only
  *     declares `ClusteredDistribution`/`SortOrder` requirements and
  *     `EnsureRequirements` plans the exchanges, so AQE coalescing
  *     applies as usual.
  *
  * Right rows must be unique per (key, time) — pre-aggregate if not (ties
  * at identical timestamps are ambiguous in any as-of semantics). At equal
  * timestamps the right row wins (`<=`, inclusive).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    outNames: Seq[String]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.zip(outNames).map { case (a, n) =>
      a.withNullability(true).withName(n)
    }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoinNode → AsofJoinExec. Registered per-session via
  * `spark.experimental.extraStrategies` (idempotent, see AsofJoin.native).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.payload, n.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    output: Seq[Attribute]) extends SparkPlan with BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** One hash exchange per side, each on its own key and row width. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** EnsureRequirements inserts the (key, time) sorts. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  /** Left rows stream through unchanged: partitioning + ordering survive. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val payloadAttrs = payload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) extraction per side; natural lexicographic ordering on
      // (key, time) drives the merge, a field-0-only ordering checks key
      // equality (BaseOrdering over 2-field rows reading ordinal 0 only).
      val lktProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rktProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lKey.dataType, lTime.dataType))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ payloadAttrs.map(_.withNullability(true)))
      val joiner = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.length)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var held: UnsafeRow = null    // payload of latest right row consumed
        private var heldKt: UnsafeRow = null  // its (key, time)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lktProj(l)
          // Consume every right row at-or-before l in (key, time) order.
          // Rows of earlier keys are skipped; rows of l's key become the
          // held candidate (later consumes overwrite earlier = latest wins).
          var scanning = true
          while (scanning && rCur != null) {
            val rkt = rktProj(rCur)
            if (ktOrd.compare(rkt, lkt) <= 0) {
              if (keyOrd.compare(rkt, lkt) == 0) {
                held = payloadProj(rCur).copy()
                heldKt = rkt.copy()
              }
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              scanning = false
            }
          }
          val p: InternalRow =
            if (heldKt != null && keyOrd.compare(heldKt, lkt) == 0) held
            else nullPayload
          numOutputRows += 1
          resultProj(joiner(l, p))
        }
      }
    }
  }
}
