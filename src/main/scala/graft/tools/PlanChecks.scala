package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Structural plan audits shared by [[PlanAudit]] and the spec that pins
  * them. The r12 judge found the previous global-window "detector" was a
  * string grep for `"Window operation!"` — Spark's WindowExec LOG WARNING
  * text, which never appears in `explainString` output — so the column
  * had been vacuously 0 since r10. This walks the physical plan instead:
  * a window node with an empty `partitionSpec` is the real single-
  * partition-sort shape the audit exists to catch (every row of the
  * child flows through ONE task — the scale-killer unless the child is a
  * provably bounded frame).
  */
object PlanChecks {

  /** Descriptions of every window node in `df`'s physical plan whose
    * `partitionSpec` is empty — including plans nested in already-
    * planned subqueries. Uses the pre-AQE `sparkPlan` (window nodes are
    * placed there; no execution is triggered). Subquery expressions that
    * still hold LOGICAL plans at this stage (planned lazily during
    * preparation — the scalar-count sizing subqueries) are walked at the
    * logical level, so a window hiding inside one is still caught.
    */
  def globalWindows(df: DataFrame): Seq[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    def walkLogical(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
      p.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty =>
          acc += s"Window(logical)[${w.windowExpressions.map(_.name).mkString(",")}]"
        case node => node.expressions.foreach(_.foreach {
          case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
            pe.plan match {
              case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
                walkLogical(lp)
              case _ =>
            }
          case _ =>
        })
      }
    def walk(plan: org.apache.spark.sql.execution.SparkPlan): Unit =
      plan.foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          acc += s"WindowExec[${w.windowExpression.map(_.name).mkString(",")}]"
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          acc += s"WindowGroupLimitExec[limit=${w.limit}]"
        case node => node.expressions.foreach(_.foreach {
          case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
            pe.plan match {
              case sp: org.apache.spark.sql.execution.SparkPlan => walk(sp)
              case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
                walkLogical(lp)
              case _ =>
            }
          case _ =>
        })
      }
    walk(df.queryExecution.sparkPlan)
    acc.toSeq
  }
}
