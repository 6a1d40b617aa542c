package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression.
  *
  * Exact dedup keys must not split on representation artifacts: "café"
  * precomposed (U+00E9) and decomposed ("e" + U+0301) are different
  * byte strings for the same text, and web corpora mix both freely.
  * Spark ships no normalization function, and a Scala UDF would leave
  * whole-stage codegen; this is the (b)-tier extension point — a scalar
  * `UnaryExpression` whose `doGenCode` emits a direct
  * `java.text.Normalizer` call (JDK-bundled, Unicode-standard forms),
  * staying inside the generated pipeline.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with Serializable {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $form")

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("normalized")
      s"""
         |java.lang.String $s = java.text.Normalizer.normalize(
         |  $input.toString(), java.text.Normalizer.Form.$form);
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpressions {

  /** Column wrapper: `unicode_normalize(text, form)`. */
  def unicodeNormalize(text: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(GraftColumnBridge.expression(text), form))
}
