package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All-tables random-hyperplane LSH signature in one pass.
  *
  * Plane component signs are a pure function of (table, plane, dim) — the
  * md5-parity scheme of graft.sim.Similarity.lshSignature — so the whole
  * ±1 matrix is computed ONCE at expression construction and reused for
  * every row. The declarative form re-derived each sign with an md5 call
  * per (row, table, plane, dim): 2048 interpreted md5s per row.
  * Output: one bucket bitstring per table.
  */
case class LshSigExpr(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** signs(t*planes+p)(d-1) = ±1, identical to the md5-parity rule in
    * Similarity.lshSignature (nibble (d-1)%32 of md5("<t>:<p>:<(d-1)/32>")).
    */
  @transient private lazy val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * planes) { tp =>
      val t = tp / planes
      val p = tp % planes
      Array.tabulate(dims) { d0 =>
        val hexIdx = d0 % 32
        val block = d0 / 32
        md.reset()
        val hex = md.digest(s"$t:$p:$block".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val nibble = Character.digit(hex.charAt(hexIdx), 16)
        if (nibble >= 8) 1.0 else -1.0
      }
    }
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    val vec = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { vec(i) = arr.getFloat(i).toDouble; i += 1 }
    else while (i < n) { vec(i) = arr.getDouble(i); i += 1 }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val sb = new java.lang.StringBuilder(planes)
      var p = 0
      while (p < planes) {
        val s = signs(t * planes + p)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += vec(d) * s(d); d += 1 }
        sb.append(if (acc > 0) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshSigExpr =
    copy(child = c)
  override def prettyName: String = "lsh_sig"
}
