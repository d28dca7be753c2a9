package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Native dot product over two numeric arrays (embedding similarity hot
  * path). One tight JVM loop over the columnar ArrayData — no per-element
  * lambda dispatch and no intermediate zipped arrays, unlike
  * `aggregate(zip_with(...))`, which allocates an array and evaluates two
  * higher-order lambdas per pair. Accumulates left-to-right in double, so
  * results are deterministic and match a sequential SQL rendering.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (isFloat(left) && isFloat(right)) {
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
    } else if (isFloat(left)) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else if (isFloat(right)) {
      while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProductExpr = copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}
