package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram shingles from a token array, evaluating the token array
  * ONCE. The declarative `transform(sequence(...), i ->
  * concat_ws(element_at(toks, i), ...))` form re-evaluates the token
  * subtree (a regexp_extract_all) for every element of every shingle —
  * ~3×|shingles| tokenizations per row (measured: 11 s → <1 s for the
  * sf0.1 shingle explode).
  *
  * Semantics identical to TextAnalysis.shinglesDeclarative: n-grams joined
  * with ' ' when |tokens| ≥ n, else the single whole-token-stream shingle.
  */
case class NGramShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out: Array[Any] =
      if (m >= n) {
        val res = new Array[Any](m - n + 1)
        var s = 0
        while (s <= m - n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          res(s) = UTF8String.fromString(sb.toString)
          s += 1
        }
        res
      } else Array[Any](UTF8String.fromString(toks.mkString(" ")))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): NGramShinglesExpr =
    copy(child = c)
  override def prettyName: String = "ngram_shingles"
}
