package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Byte-packed PQ codes — the production posting layout. A PQ code is m
  * sub-quantizer ordinals of log2(k) bits each (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 §II: typically
  * m bytes per vector at k = 256). Storing them as an m-byte BINARY
  * instead of an array of 4-byte ints shrinks the dominant artifact of
  * a 100 TB vector index ~4×. Ordinals are unsigned bytes (0..255), so
  * k ≤ 256 round-trips exactly; [[UnpackBytesExpr]] restores the int
  * array for the ADC LUT join.
  */
case class PackBytesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  // values are truncated to their low byte (x & 0xFF) by contract —
  // callers own the 0..255 range (PqIndex requires k ≤ 256); the type
  // check below rejects the silent array<bigint> mis-read, where
  // getInt would return the wrong half of the word
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_bytes expects ARRAY<INT>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // fail loudly: getInt on a null slot reads garbage (0 for unsafe
      // arrays) and would silently encode a wrong code byte — nullable
      // element types (containsNull=true) pass the static check because
      // transform/collect_list infer them even over non-null data
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"pack_bytes: null array element at index $i")
      out(i) = (a.getInt(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $c.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "pack_bytes: null array element at index " + $i);
         |  }
         |  $out[$i] = (byte) ($c.getInt($i) & 0xFF);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PackBytesExpr =
    copy(child = c)
  override def prettyName: String = "pack_bytes"
}

/** Inverse of [[PackBytesExpr]]: m-byte binary → m-element int array of
  * unsigned byte values. Runs per ADC candidate (the query hot path) —
  * one tight loop, no per-element lambda dispatch.
  */
case class UnpackBytesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_bytes expects BINARY, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i) & 0xFF; i += 1 }
    new GenericArrayData(out)
  }

  // real codegen: this runs per ADC candidate inside a generator chain —
  // a CodegenFallback here splits the whole-stage span around the
  // explode (the r11 100× probe measured the PQ query leg 2.6× slower
  // on the fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $c.length;
         |final int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $c[$i] & 0xFF;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): UnpackBytesExpr =
    copy(child = c)
  override def prettyName: String = "unpack_bytes"
}
