package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Replace the FIRST occurrence of a literal substring — Python's
  * `str.replace(find, repl, 1)` (used for the `data/` → identifier-prefix
  * rewrite, reference: lambda_functions/tre-bagit-to-dri-sip/tre_bagit.py:74,
  * and tar prefix substitution, s3_lib/s3_lib/tar_lib.py:159).
  * Spark's `regexp_replace` replaces all occurrences, so this is a tiny
  * native expression instead of a Scala UDF.
  */
case class ReplaceFirstExpr(str: Expression, find: Expression, repl: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def first: Expression = str
  override def second: Expression = find
  override def third: Expression = repl

  override def nullSafeEval(s: Any, f: Any, r: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val find = f.asInstanceOf[UTF8String].toString
    val repl = r.asInstanceOf[UTF8String].toString
    val i = str.indexOf(find)
    val out =
      if (find.isEmpty || i < 0) str
      else str.substring(0, i) + repl + str.substring(i + find.length)
    UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ReplaceFirstExpr =
    copy(str = f, find = s, repl = t)
  override def prettyName: String = "replace_first"
}
