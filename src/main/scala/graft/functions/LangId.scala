package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native marker-argmax language ID over a token array. The declarative
  * rendering (`TextAnalysis.languageIdDeclarative`) builds one
  * interpreted-HOF `filter` per (language, comparison) reference — the
  * token-array subtree gets re-evaluated ~25×/row. Here: ONE pass over the
  * tokens, membership checks against per-language UTF8String hash sets,
  * then first-index argmax — ties keep the earlier language in `labels`,
  * an all-zero profile yields "unknown" (identical semantics, pinned by
  * TrainSpec parity + the `text_lang_id` oracle).
  */
case class LangIdExpr(child: Expression, labels: Seq[String],
                      markers: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  require(labels.size == markers.size, "one marker list per label")

  override def dataType: DataType = StringType

  @transient private lazy val sets: Array[Set[UTF8String]] =
    markers.map(_.map(UTF8String.fromString).toSet).toArray
  @transient private lazy val out: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray
  @transient private lazy val unknown = UTF8String.fromString("unknown")

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val counts = new Array[Int](sets.length)
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val t = a.getUTF8String(i)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var best = -1
    var j = 0
    while (j < counts.length) {
      if (counts(j) > 0 && (best < 0 || counts(j) > counts(best))) best = j
      j += 1
    }
    if (best < 0) unknown else out(best)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}
